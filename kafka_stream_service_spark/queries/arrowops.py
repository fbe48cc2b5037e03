"""Arrow-native Python execution surfaces (round 6 extension): pandas
GROUPED_AGG UDAFs, mapInArrow batch transforms, and applyInArrow grouped
maps — the three Python fast paths a PySpark 4 user reaches for when a
computation genuinely cannot stay in Catalyst.

Each query keeps the Python side integer-exact (Python ints are
arbitrary-precision, so the UDFs are bit-deterministic) and is oracled
against the pure-SQL statement of the same arithmetic — proving the
Arrow transfer (including the decimal->int conversions at the boundary)
is lossless, the same contract style as q_udf_pandas_scalar.

Scale: all three run Arrow-batched (columnar transfer, vectorizable
inside the worker) and partition-parallel; GROUPED_AGG additionally
map-side-combines nothing (it sees whole groups), so group cardinality
x group size is the shuffle unit — documented per query.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import tables
from .registry import query


# ---------------------------------------------------------------------------
# pandas GROUPED_AGG UDAF
# ---------------------------------------------------------------------------

_UDAF_ORACLE = """
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS v_cents,
             CAST(props ->> '$.k' AS BIGINT) AS w
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(FLOOR(1000000.0 * SUM(v_cents * w) / SUM(w)) AS BIGINT)
             AS wmean_micro
    FROM v GROUP BY event_type
"""


@query(
    "q_udaf_grouped_agg",
    oracle=_UDAF_ORACLE,
    tags=("udf", "pandas-udaf", "arrow"),
)
def q_udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via a pandas GROUPED_AGG UDAF: the k-weighted
    mean event value per type, computed with Python's arbitrary-
    precision integers (floor(1e6 * sum(v*w)/sum(w)) — exact, so the
    oracle hash must match bit-for-bit). This is the UDAF surface:
    a scalar per group from arbitrary Python over the group's columns,
    usable anywhere a built-in aggregate is.

    Scale shape: Spark feeds the UDAF whole groups through Arrow after
    the hash shuffle on event_type — per-executor memory is bounded by
    the largest group, the documented UDAF trade vs map-side-combinable
    built-ins; for combinable statistics prefer the Catalyst form
    (the oracle IS that form). Weights and cents arrive as int64
    columns, so the Arrow transfer is exact.
    """

    @F.pandas_udf(T.LongType())
    def wmean_micro(v_cents: pd.Series, w: pd.Series) -> int:
        num = int((v_cents.astype(object) * w.astype(object)).sum())
        den = int(w.sum())
        return 1000000 * num // den

    # Catalyst forbids mixing a GROUPED_AGG UDAF with built-in
    # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the row
    # count is a second UDAF — the documented all-or-nothing trade of
    # the pandas-aggregate path.
    @F.pandas_udf(T.LongType())
    def n_rows(v_cents: pd.Series) -> int:
        return len(v_cents)

    ev = tables(spark, sf_dir)["events"]
    v = ev.select(
        "event_type",
        (F.col("value").cast("decimal(10,2)") * 100).cast("bigint").alias("v_cents"),
        F.get_json_object("props", "$.k").cast("bigint").alias("w"),
    )
    return v.groupBy("event_type").agg(
        n_rows("v_cents").alias("n"),
        wmean_micro("v_cents", "w").alias("wmean_micro"),
    )


# ---------------------------------------------------------------------------
# mapInArrow batch transform
# ---------------------------------------------------------------------------

_ARROW_MAP_ORACLE = """
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             octet_length(CAST(text AS BLOB)) AS n_bytes
      FROM documents
    )
    SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM m
"""


@query(
    "q_arrow_map_batches",
    oracle=_ARROW_MAP_ORACLE,
    tags=("udf", "arrow", "mapinarrow"),
)
def q_arrow_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-pandas Python batch path — RecordBatches in,
    RecordBatches out, with the computation in pyarrow.compute kernels
    (vectorized C++, no per-row Python, no pandas materialization).
    Counts tokens and UTF-8 bytes per document; the corpus totals must
    match the SQL statement of the same arithmetic.

    Scale shape: narrow map, partition-parallel, no shuffle before the
    final 1-row aggregate; peak worker memory is one Arrow batch
    (spark.sql.execution.arrow.maxRecordsPerBatch), not a partition.
    mapInArrow beats mapInPandas where the work is pure columnar kernel
    (no .to_pandas() copy) — exactly this shape.
    """

    def stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        for b in batches:
            text = b.column(b.schema.get_field_index("text"))
            toks = pc.list_value_length(pc.split_pattern(text, " "))
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("doc_id")),
                    pc.cast(toks, pa.int64()),
                    pc.cast(pc.binary_length(text), pa.int64()),
                ],
                names=["doc_id", "n_tokens", "n_bytes"],
            )

    from ..operators.ranks import cpu_fanout

    # corpus-proportional Arrow lane: fan a narrow scan (no-op at scale)
    d = cpu_fanout(tables(spark, sf_dir)["documents"].select("doc_id", "text"))
    m = d.mapInArrow(stats, "doc_id long, n_tokens long, n_bytes long")
    return m.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max("n_tokens").cast("bigint").alias("max_tokens"),
    )


# ---------------------------------------------------------------------------
# applyInArrow grouped map
# ---------------------------------------------------------------------------

_ARROW_GROUPED_ORACLE = """
    WITH v AS (
      SELECT lang,
             CAST(n_chars AS BIGINT) AS c,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MIN(c) AS BIGINT) AS min_chars,
           CAST(MAX(c) AS BIGINT) AS max_chars,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN c END) AS BIGINT)
             AS median_lo_chars
    FROM v GROUP BY lang
"""


@query(
    "q_arrow_grouped_stats",
    oracle=_ARROW_GROUPED_ORACLE,
    tags=("udf", "arrow", "applyinarrow"),
)
def q_arrow_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInArrow grouped map: per-language robust length profile
    (count, min, max, lower-median) computed over each group's Arrow
    table with pyarrow kernels — the grouped twin of mapInArrow, for
    per-group logic that needs the whole group materialized (sorting
    for an exact order statistic here). The lower median is the
    rank-ceil(n/2) element under the (n_chars, doc_id) total order,
    stated identically by the oracle's window form.

    Scale shape: one hash shuffle on the group key; per-executor memory
    is the largest group as ONE Arrow table (no pandas copy). Same
    whole-group trade as the GROUPED_AGG UDAF; the min/max/count legs
    would be map-side-combinable built-ins alone — the exact median is
    what buys the grouped map.
    """

    def profile(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            t, sort_keys=[("n_chars", "ascending"), ("doc_id", "ascending")]
        )
        s = t.take(idx)
        n = s.num_rows
        c = s.column("n_chars")
        med = c[(n + 1) // 2 - 1].as_py()
        return pa.table(
            {
                "lang": [s.column("lang")[0].as_py()],
                "n_docs": pa.array([n], pa.int64()),
                "min_chars": pa.array([c[0].as_py()], pa.int64()),
                "max_chars": pa.array([c[n - 1].as_py()], pa.int64()),
                "median_lo_chars": pa.array([med], pa.int64()),
            }
        )

    d = tables(spark, sf_dir)["documents"].select(
        "lang", F.col("n_chars").cast("bigint").alias("n_chars"), "doc_id"
    )
    return d.groupBy("lang").applyInArrow(
        profile,
        "lang string, n_docs long, min_chars long, max_chars long, median_lo_chars long",
    )
