"""Z-order (Morton) layout for multi-dimensional data skipping.

Sorting a table by ONE column makes that column's per-file min/max
ranges tight (parquet row-group pruning) but leaves every other column's
ranges spanning the whole domain. Interleaving the bits of two bucketed
columns into a Morton code and sorting by THAT gives both columns
locality at once — the standard lakehouse layout lever (Delta/Iceberg
OPTIMIZE ZORDER BY) for tables filtered on multiple dimensions.

Everything here is pure integer arithmetic (floor-div / mod / scaled
adds), so the z-values are bit-identical across engines and the catalog
query carries a full driver hash verdict.

Scale shape (100 TB): computing z is map-side; the rewrite is one
range-partitioned sort (the same shuffle a single-column sort costs) —
paid once at write time, amortized over every multi-dimension scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 6  # bits per dimension -> 12-bit Morton codes


def interleave_bits(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton code of two non-negative ints (a in even bit positions,
    b in odd): z = sum_k (bit_k(a) * 4^k + bit_k(b) * 2 * 4^k).
    Arithmetic only — no engine-specific bit intrinsics — so the same
    formula runs as the DuckDB oracle."""
    z: Column = F.lit(0).cast("bigint")
    for k in range(bits):
        bit_a = (a.cast("bigint") / (2**k)).cast("bigint") % 2
        bit_b = (b.cast("bigint") / (2**k)).cast("bigint") % 2
        z = z + bit_a * (4**k) + bit_b * (2 * 4**k)
    return z


def interleave_bits_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """The identical Morton formula as a SQL expression (DuckDB oracle)."""
    terms = []
    for k in range(bits):
        terms.append(f"((CAST({a} AS BIGINT) // {2 ** k}) % 2) * {4 ** k}")
        terms.append(f"((CAST({b} AS BIGINT) // {2 ** k}) % 2) * {2 * 4 ** k}")
    return " + ".join(terms)


def zorder_rewrite(df: DataFrame, z: Column, n_files: int) -> DataFrame:
    """Range-partition by the Morton code and sort within partitions —
    the OPTIMIZE ZORDER write shape. Returns the frame ready to write;
    each output file covers a contiguous z-range, so BOTH interleaved
    dimensions get tight per-file min/max stats."""
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
