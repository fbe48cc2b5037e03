"""Oracle-checked codec round-trip (reference parity through the driver).

Builds a Message per document (headers = {lang: [...], source: [...]},
payload = utf-8 text), encodes to the reference wire format, decodes back,
and surfaces the recovered fields. The oracle is simply the original
columns — so a hash match proves encode->decode is lossless end-to-end
through the Arrow/pandas UDF path, the Spark analog of the reference's
round-trip test (MessageSerializerTests.java:37-49).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codec import decode_message, encode_message, message_struct
from ..tables import tables
from .registry import query


@query(
    "q_codec_roundtrip",
    oracle="""
    SELECT doc_id, lang AS hdr_lang, source AS hdr_source, text AS payload_text,
           length(text) AS payload_len
    FROM documents
    WHERE doc_id % 10 = 0
    """,
    tags=("codec", "reference-parity"),
)
def q_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encode_message -> decode_message identity over real rows."""
    d = tables(spark, sf_dir)["documents"].filter(F.col("doc_id") % 10 == 0)
    headers = F.create_map(
        F.lit("lang"), F.array(F.col("lang")),
        F.lit("source"), F.array(F.col("source")),
    )
    msg = message_struct(headers, F.encode(F.col("text"), "utf-8"))
    encoded = d.select("doc_id", encode_message(msg).alias("wire"))
    decoded = encoded.select("doc_id", decode_message(F.col("wire")).alias("msg"))
    return decoded.select(
        "doc_id",
        F.element_at(F.col("msg.headers"), "lang").getItem(0).alias("hdr_lang"),
        F.element_at(F.col("msg.headers"), "source").getItem(0).alias("hdr_source"),
        F.decode(F.col("msg.payload"), "utf-8").alias("payload_text"),
        F.length(F.decode(F.col("msg.payload"), "utf-8")).alias("payload_len"),
    )
