"""Coverage completions: unpivot/stack, from_json struct parsing,
GROUPING() indicators, salted skew join (SURVEY.md §2.2 remainder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import tables
from ._util import dec, dsum, work_dir
from .registry import query


@query(
    "q_unpivot_stack",
    oracle="""
    SELECT p_partkey, metric, value FROM (
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
    ) WHERE p_partkey % 9 = 0
    """,
    tags=("reshape", "unpivot"),
)
def q_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via the native unpivot/melt operator."""
    p = tables(spark, sf_dir)["part"].filter(F.col("p_partkey") % 9 == 0)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    ).unpivot("p_partkey", ["size", "retailprice"], "metric", "value")


@query(
    "q_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_typed,
           CAST(json_extract(props, '$.k') AS INT) * 2 AS k_doubled,
           (CAST(json_extract(props, '$.k') AS INT) IS NOT NULL) AS parsed_ok
    FROM events WHERE event_type = 'signup'
    """,
    tags=("scalar", "json"),
)
def q_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd JSON parsing (from_json -> typed struct, not string
    extraction) — the structured counterpart of get_json_object."""
    e = tables(spark, sf_dir)["events"].filter(F.col("event_type") == "signup")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = F.from_json(F.col("props"), schema)
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        (parsed.getField("k") * 2).alias("k_doubled"),
        parsed.getField("k").isNotNull().alias("parsed_ok"),
    )


@query(
    "q_rollup_grouping_id",
    oracle="""
    SELECT c_mktsegment,
           CAST(c_nationkey % 3 AS INT) AS nation_mod,
           CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
           CAST(GROUPING(c_nationkey % 3) AS INT) AS g_mod,
           COUNT(*) AS n
    FROM customer
    GROUP BY ROLLUP (c_mktsegment, c_nationkey % 3)
    """,
    tags=("agg", "rollup", "grouping"),
)
def q_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() indicators (distinguish real NULL groups
    from subtotal rows)."""
    tables(spark, sf_dir)["customer"].createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(c_nationkey % 3 AS INT) AS nation_mod,
               CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
               CAST(GROUPING(c_nationkey % 3) AS INT) AS g_mod,
               COUNT(*) AS n
        FROM customer
        GROUP BY ROLLUP (c_mktsegment, c_nationkey % 3)
        """
    )


@query(
    "q_salted_skew_join",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    tags=("join", "skew"),
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join operator must be *semantically invisible*: same
    result as the plain equi-join (oracle), different physical
    distribution (hot keys scattered across 8 salt buckets).
    force_shuffle pins the sort-merge path (plan-asserted in
    tests/test_plans.py) — without it the small test SF would broadcast
    and the salted shuffle machinery would go unexercised."""
    from ..operators.salted import salted_join

    t = tables(spark, sf_dir)
    joined = salted_join(
        t["lineitem"],
        t["orders"],
        big_key="l_orderkey",
        small_key="o_orderkey",
        salt_buckets=8,
        force_shuffle=True,
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum(dec("l_quantity", 18, 2), "sum_qty")
    )


@query(
    "q_udtf_token_positions",
    oracle="""
    WITH e AS (
      SELECT doc_id, toks,
             unnest(range(0, CAST(LEAST(len(toks), 5) AS BIGINT))) AS i
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < 40)
    )
    SELECT doc_id, CAST(i AS INT) AS pos, toks[CAST(i + 1 AS INT)] AS token
    FROM e
    """,
    tags=("udtf", "text"),
)
def q_udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF (1→N table function, Spark 3.5+ API) applied via
    SQL LATERAL — the declared-UDTF counterpart of the explode-based
    UDTF coverage (q_explode_variants).

    First-5-token positions per document; bounded input because a Python
    UDTF is the slow path by design — at scale this surface is for logic
    explode() can't express, and the lateral join keeps it parallel per
    input partition with no shuffle.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string", useArrow=True)
    class TokenPositions:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")[:5]):
                yield i, tok

    spark.udtf.register("token_positions", TokenPositions)
    tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 40).select(
        "doc_id", "text"
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM udtf_docs d, LATERAL token_positions(d.text) t"
    )


@query(
    "q_orc_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    """
    + "GROUP BY event_type",
    tags=("source", "orc", "format"),
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink coverage: write the events table to ORC (zstd) and
    aggregate from the ORC scan. The oracle aggregates the original
    parquet — a value-hash match proves the ORC round trip is lossless
    for longs, doubles, strings, and timestamps.

    ORC is Spark-native (no extra package) and columnar like parquet:
    predicate pushdown and column pruning apply to the re-read the same
    way test_plans.py asserts for parquet scans.
    """
    ev = tables(spark, sf_dir)["events"]
    path = work_dir("orc_rt", sf_dir) + "/events_orc"
    ev.write.mode("overwrite").option("compression", "zstd").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(dec("value"), "sum_value"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


@query(
    "q_csv_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           MIN(event_id) AS min_id, MAX(user_id) AS max_user
    FROM events
    GROUP BY event_type
    """,
    tags=("source", "csv", "format"),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink coverage: longs, strings, and doubles through a
    header CSV write/read cycle with an explicit read schema (inference
    is a scale anti-pattern: it costs an extra pass and can flip types
    between runs). Doubles survive exactly — the writer emits
    shortest-roundtrip decimal text. Timestamps are deliberately not put
    through CSV (format-dependent); they belong in columnar formats or
    JSON."""
    ev = tables(spark, sf_dir)["events"].select("event_id", "event_type", "user_id", "value")
    path = work_dir("csv_rt", sf_dir) + "/events_csv"
    ev.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema("event_id long, event_type string, user_id long, value double").option(
        "header", True
    ).csv(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(dec("value"), "sum_value"),
        F.min("event_id").alias("min_id"),
        F.max("user_id").alias("max_user"),
    )


@query(
    "q_json_roundtrip",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_doc
    FROM documents
    GROUP BY lang
    """,
    tags=("source", "json", "format"),
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink coverage with NESTED data — the reason to
    reach for JSON over CSV: each document is written as a struct
    (meta.lang/meta.source) plus its token array, read back with an
    explicit nested schema, and re-aggregated from the nested fields.
    A hash match proves structs and arrays survive the text round trip."""
    d = tables(spark, sf_dir)["documents"]
    nested = d.select(
        "doc_id",
        F.struct(F.col("lang"), F.col("source")).alias("meta"),
        F.split(F.col("text"), " ").alias("tokens"),
    )
    path = work_dir("json_rt", sf_dir) + "/docs_json"
    nested.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "doc_id long, meta struct<lang:string, source:string>, tokens array<string>"
    ).json(path)
    return back.groupBy(F.col("meta.lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("tokens")).alias("total_tokens"),
        F.min("doc_id").alias("min_doc"),
    )


@query(
    "q_avro_roundtrip",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MIN(doc_id) AS min_doc
    FROM documents
    GROUP BY lang
    """,
    tags=("source", "avro", "format", "codec"),
)
def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro coverage without the external spark-avro module: each document
    row is serialized to Avro binary (to_avro) and parsed back (from_avro)
    with a nullable-union record schema, then re-aggregated from the
    decoded struct. The codec is the pure-Python Avro spec implementation
    in functions/avro_codec.py, run as Arrow-batched pandas UDFs — the
    Kafka-value use case spark-avro is typically deployed for. A hash
    match proves longs, UTF-8 strings, and nullable unions survive the
    binary round trip."""
    import json as _json

    from ..functions.avro_codec import from_avro, to_avro

    sch = _json.dumps(
        {
            "type": "record",
            "name": "doc",
            "fields": [
                {"name": "doc_id", "type": "long"},
                {"name": "lang", "type": ["null", "string"]},
                {"name": "text", "type": ["null", "string"]},
                {"name": "n_chars", "type": "long"},
            ],
        }
    )
    from ..operators.ranks import cpu_fanout

    # two corpus-wide Python codec passes: fan a narrow scan (no-op at scale)
    d = cpu_fanout(tables(spark, sf_dir)["documents"])
    wire = d.select(
        to_avro(F.struct("doc_id", "lang", "text", "n_chars"), sch).alias("value")
    )
    back = wire.select(from_avro(F.col("value"), sch).alias("r")).select("r.*")
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.octet_length("text")).cast("bigint").alias("total_bytes"),
        F.min("doc_id").alias("min_doc"),
    )


@query(
    "q_text_roundtrip",
    oracle="""
    SELECT coalesce(lang, '') AS lang, COUNT(*) AS n_docs,
           CAST(SUM(length(coalesce(text, ''))) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM documents
    GROUP BY 1
    """,
    tags=("source", "text", "format"),
)
def q_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain-text source/sink coverage — the log-line / WET-extract
    ingest shape: documents serialized as one TAB-delimited line each
    (``doc_id \\t lang \\t text``) through ``write.text`` and parsed
    back from raw lines with a bounded ``split(_, tab, 3)`` (limit 3 so
    the free-text tail is never split, the standard log-parse guard).
    The oracle states the aggregate over the ORIGINAL table, so any
    parse loss — a swallowed line, a mis-split field, a mangled
    doc_id — flips counts, char totals, or key bounds.

    Line-format hardening (r5 ADVICE): embedded CR/LF in ``text`` would
    silently split one document across lines on ``write.text``, so
    newlines are flattened to spaces BEFORE framing (length-preserving —
    1 char -> 1 char — so the oracle's char totals over the original
    text still hold), and nullable ``lang``/``text`` go through explicit
    ``coalesce(_, '')`` rather than relying on concat_ws's NULL-skip,
    which would shift fields on parse-back; the oracle applies the same
    coalesce. A NULL ``doc_id`` (round-7 adversarial tier) frames as an
    empty first field — concat_ws would otherwise SKIP the null and
    shift every field left — and parses back to NULL via ``try_cast``,
    which min/max skip on both engines.

    At 100 TB: text is the lowest-common-denominator interchange format;
    the scan parallelizes per line-split like any file source, the parse
    is one map-side projection (no inference pass), and the single
    ``value`` column means column pruning has nothing to prune — reach
    for parquet the moment fields are accessed independently.
    """
    d = tables(spark, sf_dir)["documents"]
    path = work_dir("text_rt", sf_dir) + "/docs_txt"
    d.select(
        F.concat_ws(
            "\t",
            F.coalesce(F.col("doc_id").cast("string"), F.lit("")),
            F.coalesce(F.col("lang"), F.lit("")),
            F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), "[\\r\\n]", " "),
        ).alias("value")
    ).write.mode("overwrite").text(path)
    parts = F.split(F.col("value"), "\t", 3)
    back = spark.read.text(path).select(
        parts.getItem(0).try_cast("long").alias("doc_id"),
        parts.getItem(1).alias("lang"),
        parts.getItem(2).alias("text"),
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
