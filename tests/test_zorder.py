"""Z-order layout: the file-level data-skipping effect (the reason the
operator exists) — after zorder_rewrite, BOTH interleaved columns have
tight per-file ranges, vs a single-column sort where only the sorted
column does."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_service_spark.operators.zorder import interleave_bits, zorder_rewrite
from kafka_stream_service_spark.tables import tables

SF = "/root/testdata/sf0.01"
N_FILES = 16


def _avg_range_fraction(spark, path, col, domain):
    """Mean per-file (max-min)/domain — 1.0 means every file spans the
    whole domain (no skipping possible), small means tight stats."""
    import glob

    fracs = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        row = spark.read.parquet(f).agg(F.min(col), F.max(col)).collect()[0]
        fracs.append((row[1] - row[0]) / domain)
    return sum(fracs) / len(fracs)


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    li = tables(spark, SF)["lineitem"].select("l_quantity", "l_extendedprice")
    qb = F.col("l_quantity").cast("int") - 1
    pb = F.least(F.floor(F.col("l_extendedprice") / 2000).cast("int"), F.lit(63))

    z_path = str(tmp_path / "zorder")
    zorder_rewrite(li, interleave_bits(qb, pb), N_FILES).write.parquet(z_path)

    # baseline: single-column sort (price only)
    s_path = str(tmp_path / "pricesort")
    (
        li.repartitionByRange(N_FILES, "l_extendedprice")
        .sortWithinPartitions("l_extendedprice")
        .write.parquet(s_path)
    )

    bounds = li.agg(
        F.max("l_quantity") - F.min("l_quantity"),
        F.max("l_extendedprice") - F.min("l_extendedprice"),
    ).collect()[0]
    q_dom, p_dom = float(bounds[0]), float(bounds[1])

    zq = _avg_range_fraction(spark, z_path, "l_quantity", q_dom)
    zp = _avg_range_fraction(spark, z_path, "l_extendedprice", p_dom)
    sq = _avg_range_fraction(spark, s_path, "l_quantity", q_dom)
    sp = _avg_range_fraction(spark, s_path, "l_extendedprice", p_dom)

    # price-sorted: price tight, quantity spans everything
    assert sp < 0.25 and sq > 0.9, (sp, sq)
    # z-ordered: BOTH dimensions materially tighter than the full domain
    # (16 files x 12-bit codes -> each file spans ~256 z-values, i.e.
    # roughly 4 high bits per dimension)
    assert zq < 0.55 and zp < 0.55, (zq, zp)
    # and quantity skipping is far better than under the price sort
    assert zq < sq * 0.6, (zq, sq)
