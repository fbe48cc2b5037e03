"""Round-7 operator batch 11: UDTF with a TABLE argument (Spark 4
polymorphic table function) — the last uncovered UDTF form.

q_udtf_token_positions covers the scalar-argument LATERAL form; this
covers ``f(TABLE(t) PARTITION BY k ORDER BY o)``: the engine streams
each partition's rows through one UDTF instance (eval per row,
terminate at partition end) — the SQL-standard PTF shape that ANSI
calls a polymorphic table function and that windowless per-group
streaming logic compiles to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import tables
from .registry import query


@query(
    "q_udtf_table_argument",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents GROUP BY lang
    """,
    tags=("sql-surface", "udtf", "table-argument", "round7"),
)
def q_udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF invoked with a TABLE argument partitioned by lang and
    ordered by doc_id: one stateful UDTF instance per partition streams
    the rows (eval) and emits a single summary at partition end
    (terminate) — count, char sum, first/last doc id. The ORDER BY is
    load-bearing: first/last come from stream order, not min/max, so a
    broken partition ordering flips the hash. The oracle is the plain
    GROUP BY the PTF must reproduce.

    Scale shape: the TABLE argument's PARTITION BY is a real shuffle on
    lang and each partition streams through Python once (Arrow
    batches) — state is O(1) per group, the correct PTF contract."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="lang string, n_docs bigint, total_chars bigint, first_doc bigint, last_doc bigint", useArrow=True)
    class LangSummary:
        def __init__(self):
            self.lang = None
            self.n = 0
            self.chars = 0
            self.first = None
            self.last = None

        def eval(self, row):
            self.lang = row["lang"]
            self.n += 1
            self.chars += int(row["n_chars"])
            if self.first is None:
                self.first = int(row["doc_id"])  # stream order, not min()
            self.last = int(row["doc_id"])

        def terminate(self):
            if self.n:
                yield self.lang, self.n, self.chars, self.first, self.last

    spark.udtf.register("lang_summary", LangSummary)
    tables(spark, sf_dir)["documents"].select(
        "doc_id", "lang", "n_chars"
    ).createOrReplaceTempView("ptf_docs")
    return spark.sql(
        "SELECT * FROM lang_summary(TABLE(ptf_docs) PARTITION BY lang ORDER BY doc_id)"
    )
