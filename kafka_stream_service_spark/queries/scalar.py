"""Scalar function coverage: strings, dates, math, conditionals, casts,
arrays, maps, JSON (SURVEY.md §2.2 "Projection / filter / scalar functions").

All row-level (no shuffle); every expression is a built-in Catalyst
expression inside whole-stage codegen — no Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
      upper(p_name) AS name_upper,
      lower(p_brand) AS brand_lower,
      length(p_name) AS name_len,
      substr(p_name, 1, 4) AS name_prefix,
      p_brand || ':' || p_type AS brand_type,
      trim('  ' || p_name || ' ') AS name_trimmed,
      replace(p_name, ' ', '_') AS name_snake,
      split_part(p_name, ' ', 1) AS first_word,
      regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      contains(p_name, 'red') AS has_red,
      starts_with(p_type, 'ECO') AS is_eco,
      lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
      reverse(p_brand) AS brand_rev
    FROM part
    WHERE p_name LIKE '%e%'
    """,
    tags=("scalar", "string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part (the reference's own demo function
    is `uppercase` — StreamsApplication.java:103 — generalized here)."""
    p = tables(spark, sf_dir)["part"]
    return p.filter(F.col("p_name").like("%e%")).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.col("p_name").contains("red").alias("has_red"),
        F.col("p_type").startswith("ECO").alias("is_eco"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
      CAST(year(o_orderdate) AS INT) AS order_year,
      CAST(month(o_orderdate) AS INT) AS order_month,
      CAST(day(o_orderdate) AS INT) AS order_day,
      CAST(quarter(o_orderdate) AS INT) AS order_quarter,
      CAST(isodow(o_orderdate) AS INT) - 1 AS order_weekday,
      date_trunc('month', o_orderdate) AS month_start,
      CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
      CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
      CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      strftime(o_orderdate, '%Y-%m-%d') AS iso_date,
      CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    """,
    tags=("scalar", "datetime"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over orders (UTC session, oracle-aligned)."""
    o = tables(spark, sf_dir)["orders"]
    return o.filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")).select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.weekday("o_orderdate").alias("order_weekday"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.to_date("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("timestamp_ntz").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date("o_orderdate")).alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
        F.last_day(F.to_date("o_orderdate")).cast("timestamp_ntz").alias("month_end"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
      CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) / 7, 2) AS DOUBLE) AS price_div,
      abs(l_quantity - 25.0) AS qty_dev,
      CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
      CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
      sqrt(l_quantity) AS qty_sqrt,
      round(ln(l_extendedprice), 8) AS price_ln,
      round(log10(l_extendedprice), 8) AS price_log10,
      pow(CAST(l_quantity AS DOUBLE), 2) AS qty_sq,
      CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
      CAST(l_quantity AS BIGINT) // 6 AS qty_div6,
      CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
      round(exp(l_discount), 8) AS disc_exp
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    tags=("scalar", "math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery; decimal-exact where rounding matters."""
    li = tables(spark, sf_dir)["lineitem"]
    from ._util import dec

    return li.filter(F.col("l_orderkey") % 50 == 0).select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") / 7).cast("decimal(18,2)").cast("double").alias("price_div"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 8).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 8).alias("price_log10"),
        F.pow(F.col("l_quantity").cast("double"), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.floor(F.col("l_quantity").cast("bigint") / 6).cast("bigint").alias("qty_div6"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.round(F.exp("l_discount"), 8).alias("disc_exp"),
    )


@query(
    "q_conditional_funcs",
    oracle="""
    SELECT c_custkey,
      CASE WHEN c_acctbal < 0 THEN 'debt'
           WHEN c_acctbal < 5000 THEN 'low'
           WHEN c_acctbal < 9000 THEN 'mid'
           ELSE 'high' END AS bal_bucket,
      coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_masked,
      greatest(CAST(c_acctbal AS DOUBLE), 0.0) AS bal_floor0,
      least(CAST(c_nationkey AS INT), 10) AS nation_capped,
      (c_acctbal IS NULL) AS bal_is_null,
      CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE c_custkey END AS odd_key_or_null
    FROM customer
    """,
    tags=("scalar", "conditional"),
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/coalesce/nullif/greatest/least + null handling."""
    c = tables(spark, sf_dir)["customer"]
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        F.greatest(F.col("c_acctbal").cast("double"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_nationkey").cast("int"), F.lit(10)).alias("nation_capped"),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit(None)).otherwise(F.col("c_custkey")).alias(
            "odd_key_or_null"
        ),
    )


@query(
    "q_cast_matrix",
    oracle="""
    SELECT s_suppkey,
      CAST(s_suppkey AS VARCHAR) AS key_str,
      CAST(CAST(s_suppkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
      CAST(floor(s_acctbal) AS BIGINT) AS bal_floor_int,
      CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal_dec,
      CAST(CAST(s_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_str,
      CAST(s_nationkey AS DOUBLE) AS nation_dbl,
      CAST(s_nationkey = 0 AS BOOLEAN) AS is_nation0,
      CAST(CAST(s_nationkey = 0 AS BOOLEAN) AS INT) AS is_nation0_int
    FROM supplier
    """,
    tags=("scalar", "cast"),
)
def q_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-type cast matrix (int/string/decimal/double/bool round-trips)."""
    s = tables(spark, sf_dir)["supplier"]
    return s.select(
        "s_suppkey",
        F.col("s_suppkey").cast("string").alias("key_str"),
        F.col("s_suppkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.floor("s_acctbal").cast("bigint").alias("bal_floor_int"),
        F.col("s_acctbal").cast("decimal(12,2)").cast("double").alias("bal_dec"),
        F.col("s_acctbal").cast("decimal(12,2)").cast("string").alias("bal_str"),
        F.col("s_nationkey").cast("double").alias("nation_dbl"),
        (F.col("s_nationkey") == 0).alias("is_nation0"),
        (F.col("s_nationkey") == 0).cast("int").alias("is_nation0_int"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
      CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
      json_extract_string(props, '$.missing') AS missing_field,
      CAST(json_valid(props) AS BOOLEAN) AS is_valid_json,
      to_json(struct_pack(id := event_id, typ := event_type)) AS as_json
    FROM events
    WHERE event_type = 'purchase'
    """,
    tags=("scalar", "json"),
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction/production (reference header values are JSON —
    MessageDeserializer.java:64; events.props exercises the same)."""
    e = tables(spark, sf_dir)["events"]
    return e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid_json"),
        F.to_json(F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("typ"))).alias(
            "as_json"
        ),
    )


@query(
    "q_array_funcs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id % 5 = 0)
    SELECT doc_id,
      len(toks) AS n_tokens,
      len(list_distinct(toks)) AS n_distinct,
      toks[1] AS first_tok,
      toks[-1] AS last_tok,
      list_contains(toks, 'spark') AS has_spark,
      array_to_string(list_sort(list_distinct(toks))[1:3], '|') AS first3_sorted,
      array_to_string(toks[1:5], '-') AS head_joined,
      list_position(toks, 'the') AS pos_the
    FROM t
    """,
    tags=("scalar", "array"),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery over tokenized documents."""
    d = tables(spark, sf_dir)["documents"]
    toks = F.split(F.col("text"), " ")
    return d.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 3), "|").alias(
            "first3_sorted"
        ),
        F.array_join(F.slice(toks, 1, 5), "-").alias("head_joined"),
        F.array_position(toks, "the").cast("bigint").alias("pos_the"),
    )


@query(
    "q_array_higher_order",
    oracle="""
    WITH t AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100)
    SELECT vec_id,
      CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE) AS norm_sq,
      len(list_filter(embedding, x -> x > 0)) AS n_positive,
      CAST(list_max(embedding) AS DOUBLE) AS max_val,
      CAST(list_min(embedding) AS DOUBLE) AS min_val,
      round(CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) / len(embedding), 6) AS mean_val
    FROM t
    """,
    tags=("scalar", "array", "higher-order"),
)
def q_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) over vectors."""
    e = tables(spark, sf_dir)["embeddings"]
    emb = F.col("embedding")
    norm_sq = F.aggregate(
        emb, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    total = F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return e.filter(F.col("vec_id") < 100).select(
        "vec_id",
        norm_sq.alias("norm_sq"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.array_max(emb).cast("double").alias("max_val"),
        F.array_min(emb).cast("double").alias("min_val"),
        F.round(total / F.size(emb), 6).alias("mean_val"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT n_nationkey, n_name,
      'nation' AS key0,
      n_name AS val_nation,
      CAST(n_regionkey AS VARCHAR) AS val_region,
      2 AS n_keys
    FROM nation
    """,
    tags=("scalar", "map"),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + access (the reference's header multimap —
    MessageDeserializer.java:64-65 — is a MapType column in this engine).

    The oracle states the expected *values*; the Spark side actually routes
    them through MapType ops (create_map/map_keys/element_at)."""
    n = tables(spark, sf_dir)["nation"]
    m = F.create_map(
        F.lit("nation"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        "n_name",
        F.sort_array(F.map_keys(m)).getItem(0).alias("key0"),
        F.element_at(m, "nation").alias("val_nation"),
        F.element_at(m, "region").alias("val_region"),
        F.size(m).alias("n_keys"),
    )
