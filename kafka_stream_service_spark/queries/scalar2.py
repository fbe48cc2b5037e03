"""Second scalar battery: bitwise ops, binary encodings, array algebra,
map algebra, sequence generation (SURVEY.md §2.2 scalar-function tail).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query


@query(
    "q_bitwise_ops",
    oracle="""
    SELECT n_nationkey,
      CAST(n_nationkey & 12 AS INT) AS b_and,
      CAST(n_nationkey | 3 AS INT) AS b_or,
      CAST(xor(n_nationkey, 21) AS INT) AS b_xor,
      CAST(n_nationkey << 2 AS INT) AS b_shl,
      CAST(n_nationkey >> 1 AS INT) AS b_shr,
      CAST(~n_nationkey AS INT) AS b_not,
      CAST(bit_count(CAST(n_nationkey AS BIGINT)) AS INT) AS popcount
    FROM nation
    """,
    tags=("scalar", "bitwise"),
)
def q_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shift/NOT/popcount."""
    n = tables(spark, sf_dir)["nation"]
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        k.bitwiseAND(F.lit(12)).alias("b_and"),
        k.bitwiseOR(F.lit(3)).alias("b_or"),
        k.bitwiseXOR(F.lit(21)).alias("b_xor"),
        F.shiftleft(k, 2).alias("b_shl"),
        F.shiftright(k, 1).alias("b_shr"),
        F.bitwise_not(k).alias("b_not"),
        F.bit_count(k.cast("bigint")).cast("int").alias("popcount"),
    )


@query(
    "q_binary_encodings",
    oracle="""
    SELECT s_suppkey,
      to_base64(encode(s_name)) AS name_b64,
      decode(from_base64(to_base64(encode(s_name)))) AS name_roundtrip,
      hex(encode(s_name)) AS name_hex,
      CAST(octet_length(encode(s_name)) AS INT) AS n_bytes
    FROM supplier
    """,
    tags=("scalar", "binary"),
)
def q_binary_encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """base64/hex encode-decode round trips over binary payloads (the
    opaque-payload model, MessageDeserializer.java:68)."""
    s = tables(spark, sf_dir)["supplier"]
    payload = F.encode(F.col("s_name"), "utf-8")
    return s.select(
        "s_suppkey",
        F.base64(payload).alias("name_b64"),
        F.decode(F.unbase64(F.base64(payload)), "utf-8").alias("name_roundtrip"),
        F.hex(payload).alias("name_hex"),
        F.length(payload).alias("n_bytes"),
    )


@query(
    "q_array_algebra",
    oracle="""
    WITH t AS (
      SELECT n_nationkey,
             [n_nationkey, n_nationkey + 1, n_nationkey + 2] AS a,
             [n_nationkey + 2, n_nationkey + 4] AS b
      FROM nation
    )
    SELECT n_nationkey,
      array_to_string(list_sort(list_distinct(a || b)), '|') AS union_ab,
      array_to_string(list_sort(list_intersect(a, b)), '|') AS intersect_ab,
      array_to_string(list_sort(list_filter(a, x -> NOT list_contains(b, x))), '|') AS except_ab,
      array_to_string(flatten([a, b]), '|') AS concat_ab,
      array_to_string(list_reverse(a), '|') AS rev_a,
      array_to_string(a[2:3], '|') AS mid_a,
      list_zip(a, b) IS NOT NULL AS zipped_ok,
      len(a || b) AS n_total
    FROM t
    """,
    tags=("scalar", "array"),
)
def q_array_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: union/intersect/except/concat/reverse/slice.
    Array results are '|'-joined so the output is driver-hashable."""
    n = tables(spark, sf_dir)["nation"]
    k = F.col("n_nationkey")
    a = F.array(k, k + 1, k + 2)
    b = F.array(k + 2, k + 4)

    def j(col):
        return F.array_join(col.cast("array<string>"), "|")

    return n.select(
        "n_nationkey",
        j(F.sort_array(F.array_union(a, b))).alias("union_ab"),
        j(F.sort_array(F.array_intersect(a, b))).alias("intersect_ab"),
        j(F.sort_array(F.array_except(a, b))).alias("except_ab"),
        j(F.flatten(F.array(a, b))).alias("concat_ab"),
        j(F.reverse(a)).alias("rev_a"),
        j(F.slice(a, 2, 2)).alias("mid_a"),
        F.arrays_zip(a, b).isNotNull().alias("zipped_ok"),
        F.size(F.concat(a, b)).alias("n_total"),
    )


@query(
    "q_map_algebra",
    oracle="""
    SELECT r_regionkey,
      2 AS n_entries,
      r_name AS by_key_name,
      CAST(r_regionkey * 10 AS VARCHAR) AS by_key_code,
      true AS has_name_key,
      array_to_string(list_sort(['name', 'code']), '|') AS keys_sorted
    FROM region
    """,
    tags=("scalar", "map"),
)
def q_map_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map algebra: construction, concat, lookup, membership, key listing
    (values stated literally in the oracle; the Spark side routes through
    real MapType operations)."""
    r = tables(spark, sf_dir)["region"]
    m1 = F.create_map(F.lit("name"), F.col("r_name"))
    m2 = F.create_map(F.lit("code"), (F.col("r_regionkey") * 10).cast("string"))
    m = F.map_concat(m1, m2)
    return r.select(
        "r_regionkey",
        F.size(m).alias("n_entries"),
        F.element_at(m, "name").alias("by_key_name"),
        F.element_at(m, "code").alias("by_key_code"),
        F.array_contains(F.map_keys(m), "name").alias("has_name_key"),
        F.array_join(F.sort_array(F.map_keys(m)), "|").alias("keys_sorted"),
    )


@query(
    "q_sequence_generate",
    oracle="""
    SELECT n_nationkey,
      array_to_string(range(0, n_nationkey % 5 + 1), '|') AS seq_up,
      len(range(0, n_nationkey % 5 + 1)) AS seq_len,
      array_to_string([n_nationkey for _ in range(3)], '|') AS repeated
    FROM nation WHERE n_nationkey < 10
    """,
    tags=("scalar", "generate"),
)
def q_sequence_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence/repeat generation (the lateral-range generation tier).
    Generated arrays are '|'-joined so the output is driver-hashable."""
    n = tables(spark, sf_dir)["nation"].filter(F.col("n_nationkey") < 10)
    k = F.col("n_nationkey")
    seq = F.sequence(F.lit(0), (k % 5).cast("int"))
    return n.select(
        "n_nationkey",
        F.array_join(seq.cast("array<string>"), "|").alias("seq_up"),
        F.size(seq).alias("seq_len"),
        F.array_join(F.array_repeat(k, 3).cast("array<string>"), "|").alias("repeated"),
    )
