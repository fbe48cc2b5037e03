"""Round-7 operator batch 1: event-sequence analytics and ML-data prep.

New operator families this round (no overlap with the existing funnel /
session-window / EWMA / paths tiers):

- Markov transition matrix over per-user event sequences (the
  behavioral-model fit step).
- Per-user activity bitmaps (bitset encoding of presence days — the
  roaring-bitmap shape on an integer domain).
- Gaps-and-islands run-length analysis of activity days (the classic
  SQL streak operator; distinct from session windows, which gap on
  intra-day time deltas).
- Cumulative-distinct window counts (count(DISTINCT) over a running
  frame, which Spark windows do not support natively — decomposed into
  first-seen flags + running sum, the standard lossless rewrite).
- Decile lift/gain table for a scored binary outcome (campaign-style
  model eval, integer cross-multiplied so the hash is exact).
- Calendar spine gap-fill (dense daily series with zero-filled holes —
  the feature-store resample step).
- Smoothed target encoding, min-max scaling, systematic sampling, 2-D
  histogram (train-prep staples).

Every oracle is exact: counts, BIGINT cents, integer cross-products, or
floor divisions — no float boundary can disagree between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..tables import tables
from .registry import query

# value carries exactly 2 decimals (fixture contract); cents are exact
_CENTS = "CAST(round(value * 100) AS BIGINT)"


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("bigint")


@query(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n_trans
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n_trans,
           CAST(SUM(n_trans) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from_prev
    FROM trans
    """,
    tags=("events", "sequence", "markov", "round7"),
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    count of (prev_type -> next_type) steps plus the per-source row
    total, so the transition probability is the exact rational
    n_trans / n_from_prev (emitted as its integer parts — no float
    division can drift between engines). (ts, event_id) is a total
    order, so lag() is deterministic.

    Scale shape: one window shuffle keyed by user_id (sequences stay
    co-located), then a map-side-combinable count over at most
    |types|^2 = 25 cells; the second window runs over those 25 rows.
    State never grows with stream length — this is the batch form of
    what a streaming transition counter would keep per key."""
    ev = tables(spark, sf_dir)["events"]
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    return trans.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.sum("n_trans").over(W.partitionBy("prev_type")).cast("bigint").alias("n_from_prev"),
    )


@query(
    "q_activity_bitmap",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_ix
      FROM events
    )
    SELECT user_id,
           CAST(SUM(CAST(1 AS BIGINT) << CAST(day_ix AS INT)) AS BIGINT) AS day_mask,
           COUNT(*) AS n_active_days,
           CAST(MIN(day_ix) AS BIGINT) AS first_day,
           CAST(MAX(day_ix) AS BIGINT) AS last_day
    FROM days GROUP BY user_id
    """,
    tags=("events", "bitmap", "round7"),
)
def q_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity BITMAP: each of the fixture's 30 days becomes
    one bit of a BIGINT mask (bit i = active on day i), built as
    sum(1 << day) over the distinct day set — the integer-domain bitset
    encoding behind roaring-bitmap engagement stores, where set algebra
    (AND = co-activity, OR = either-active) is one bitwise op instead
    of a join. n_active_days doubles as the mask's popcount.

    Fixture-span guard: Spark's shiftleft silently wraps the shift
    amount mod 64 while DuckDB's << does not, so a span change past day
    62 (or an event before 2024-01-01) would silently diverge between
    engines. The CASE below raises loudly instead of wrapping.

    Scale shape: distinct prunes duplicate (user, day) pairs map-side;
    one groupBy shuffle keyed by user. A year needs 366 bits = an array
    of 6 BIGINT words (chunk day_ix div 64) — same construction, no
    change in shuffle shape."""
    ev = tables(spark, sf_dir)["events"]
    days = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "day_ix"
        ),
    ).distinct()
    return days.groupBy("user_id").agg(
        F.sum(
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                "CASE WHEN day_ix BETWEEN 0 AND 62 THEN CAST(day_ix AS INT) "
                "ELSE CAST(raise_error(concat('q_activity_bitmap: day_ix outside "
                "bitmap range [0,62]: ', CAST(day_ix AS STRING))) AS INT) END)"
            )
        )
        .cast("bigint")
        .alias("day_mask"),
        F.count(F.lit(1)).alias("n_active_days"),
        F.min("day_ix").cast("bigint").alias("first_day"),
        F.max("day_ix").cast("bigint").alias("last_day"),
    )


@query(
    "q_run_length_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_ix
      FROM events
    ),
    tagged AS (
      SELECT user_id, day_ix,
             day_ix - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_ix)
               AS island
      FROM days
    ),
    islands AS (
      SELECT user_id, island, COUNT(*) AS len,
             MIN(day_ix) AS start_day, MAX(day_ix) AS end_day
      FROM tagged GROUP BY user_id, island
    )
    SELECT user_id, COUNT(*) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS total_active_days,
           CAST(MIN(start_day) AS BIGINT) AS first_day,
           CAST(MAX(end_day) AS BIGINT) AS last_day
    FROM islands GROUP BY user_id
    """,
    tags=("events", "gaps-islands", "round7"),
)
def q_run_length_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands streak analysis: maximal runs of CONSECUTIVE
    active calendar days per user via the classic day_ix - row_number
    grouping key (consecutive days share it; any gap starts a new
    island). Emits per-user streak count, longest streak, and bounds —
    the retention/engagement-streak operator, distinct from session
    windows (which gap on event-time deltas inside a day).

    Scale shape: distinct + one user-keyed window + two
    map-side-combinable aggs, all partitioned on user_id — one shuffle
    chain, no data-scale window over a single partition."""
    ev = tables(spark, sf_dir)["events"]
    days = ev.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "day_ix"
        ),
    ).distinct()
    tagged = days.select(
        "user_id",
        "day_ix",
        (
            F.col("day_ix")
            - F.row_number().over(W.partitionBy("user_id").orderBy("day_ix"))
        ).alias("island"),
    )
    islands = tagged.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day_ix").alias("start_day"),
        F.max("day_ix").alias("end_day"),
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("total_active_days"),
        F.min("start_day").cast("bigint").alias("first_day"),
        F.max("end_day").cast("bigint").alias("last_day"),
    )


@query(
    "q_window_count_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    ),
    running AS (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS distinct_so_far
      FROM flagged
    )
    SELECT user_id,
           CAST(MAX(rn) AS BIGINT) AS n_events,
           CAST(MAX(distinct_so_far) AS BIGINT) AS n_distinct_types,
           CAST(MIN(CASE WHEN distinct_so_far = 5 THEN rn END) AS BIGINT)
             AS events_to_full_coverage
    FROM running GROUP BY user_id
    """,
    tags=("window", "distinct", "round7"),
)
def q_window_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered per-user frame — a window
    Spark (and the SQL standard) refuse natively — via the lossless
    rewrite: flag each (user, type)'s FIRST occurrence, then running-sum
    the flags. Emits per user the event count, final distinct-type
    count, and how many events it took to see all 5 types (the
    time-to-full-coverage metric). Both engines run the same
    decomposition, so the oracle proves the rewrite, not engine quirks.

    Scale shape: two user-keyed window passes (one additionally keyed by
    type) — the second reuses the first's user_id partitioning; no
    global window, no distinct-set state beyond the flag bit."""
    ev = tables(spark, sf_dir)["events"]
    order = [F.col("ts"), F.col("event_id")]
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.row_number().over(
                W.partitionBy("user_id", "event_type").orderBy(*order)
            )
            == 1,
            1,
        )
        .otherwise(0)
        .alias("first_seen"),
    )
    wu = W.partitionBy("user_id").orderBy(*order)
    running = flagged.select(
        "user_id",
        "event_id",
        F.row_number().over(wu).alias("rn"),
        F.sum("first_seen").over(wu.rowsBetween(W.unboundedPreceding, 0)).alias(
            "distinct_so_far"
        ),
    )
    return running.groupBy("user_id").agg(
        F.max("rn").cast("bigint").alias("n_events"),
        F.max("distinct_so_far").cast("bigint").alias("n_distinct_types"),
        F.min(F.when(F.col("distinct_so_far") == 5, F.col("rn")))
        .cast("bigint")
        .alias("events_to_full_coverage"),
    )


@query(
    "q_decile_lift",
    oracle=f"""
    WITH scored AS (
      SELECT {_CENTS} AS score_cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
             NTILE(10) OVER (ORDER BY {_CENTS} DESC, event_id) AS decile
      FROM events
    ),
    per AS (
      SELECT decile, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos FROM scored GROUP BY decile
    ),
    cum AS (
      SELECT decile, n, n_pos,
             CAST(SUM(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
             CAST(SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
             (SELECT CAST(SUM(pos) AS BIGINT) FROM scored) AS total_pos,
             (SELECT COUNT(*) FROM scored) AS total_n
      FROM per
    )
    SELECT decile, n, n_pos, cum_n, cum_pos,
           CAST(cum_pos * total_n AS BIGINT) AS lift_num,
           CAST(cum_n * total_pos AS BIGINT) AS lift_den
    FROM cum
    """,
    tags=("mlops", "eval", "round7"),
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gain table for a scored binary outcome (score =
    event value in exact cents, positive = purchase): rank into 10
    score deciles, then cumulative capture rate vs the base rate.
    Lift is emitted as the integer cross-product pair
    (cum_pos * total_n, cum_n * total_pos) — lift = num/den exactly,
    no float division in the hash. NTILE over the (cents DESC,
    event_id) total order is deterministic on both engines.

    Scale shape (round 12): the decile comes from the distributed
    two-phase ranks (operators/ranks.py — one range exchange on the
    NEGATED score so DESC order ranks ascending, per-partition windows,
    driver offsets bounded by partition count) with the exact
    SQL-standard tile split derived arithmetically from (rank, N) —
    the replan this docstring used to merely promise; no
    single-partition window remains. The per-decile rollup stays
    map-side-combinable."""
    from ..operators.ranks import NTILE_COL, with_global_ntile

    ev = tables(spark, sf_dir)["events"]
    base = ev.select(
        _cents("value").alias("score_cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
        "event_id",
        (-_cents("value")).alias("neg_cents"),
    )
    scored = with_global_ntile(base, 10, "neg_cents", "event_id").select(
        "score_cents", "pos", F.col(NTILE_COL).alias("decile")
    )
    per = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos")
    )
    totals = scored.agg(
        F.sum("pos").alias("total_pos"), F.count(F.lit(1)).alias("total_n")
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(wc).cast("bigint").alias("cum_n"),
        F.sum("n_pos").over(wc).cast("bigint").alias("cum_pos"),
    ).crossJoin(F.broadcast(totals))
    return cum.select(
        "decile",
        "n",
        "n_pos",
        "cum_n",
        "cum_pos",
        (F.col("cum_pos") * F.col("total_n")).cast("bigint").alias("lift_num"),
        (F.col("cum_n") * F.col("total_pos")).cast("bigint").alias("lift_den"),
    )


@query(
    "q_calendar_gap_fill",
    oracle="""
    WITH span AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
    ),
    spine AS (
      SELECT t.event_type, CAST(u.d AS DATE) AS day
      FROM (SELECT DISTINCT event_type FROM events) t,
           span, unnest(generate_series(span.d0, span.d1, INTERVAL 1 DAY)) AS u(d)
    ),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT s.event_type, CAST(s.day AS TIMESTAMP) AS day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
    FROM spine s LEFT JOIN daily d
      ON d.event_type = s.event_type AND d.day = s.day
    """,
    tags=("timeseries", "gapfill", "round7"),
)
def q_calendar_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar resample: build the full (event_type x day) spine
    over the observed date span with sequence()+explode and left-join
    the daily counts, zero-filling missing days — the feature-store
    densification step that LOCF/interpolation gap-fill (q_gapfill_*)
    assumes has already run. A missing spine day or a dropped zero row
    flips the hash.

    Scale shape: the spine is |types| x |days| (tiny relative to
    events) generated JVM-side; the daily rollup is one
    map-side-combinable groupBy; the join broadcasts the spine side
    when small or hash-joins on (type, day) otherwise."""
    ev = tables(spark, sf_dir)["events"]
    span = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    types = ev.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("day"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


@query(
    "q_target_encoding",
    oracle="""
    WITH g AS (
      SELECT CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS g_sum_cents,
             COUNT(*) AS g_n
      FROM orders
    ),
    cat AS (
      SELECT o_orderpriority,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
             COUNT(*) AS n
      FROM orders GROUP BY 1
    )
    SELECT o_orderpriority, n, sum_cents,
           CAST(sum_cents * g.g_n + 10 * g.g_sum_cents AS BIGINT) AS enc_num,
           CAST((n + 10) * g.g_n AS BIGINT) AS enc_den
    FROM cat, g
    """,
    tags=("mlops", "encoding", "round7"),
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of a categorical feature (order
    priority, target = order value): encoded = (sum + m*prior)/(n + m)
    with m = 10 and prior = the global mean — emitted as the exact
    integer fraction over the common denominator (n+m)*g_n, in cents:
    enc_num = sum_cents*g_n + m*g_sum_cents, enc_den = (n+m)*g_n. The
    standard leakage-safe encoder shape (Micci-Barreca 2001), integer
    end-to-end so the hash is bit-stable.

    Scale shape: one map-side-combinable category rollup + a 1-row
    global aggregate broadcast back — no shuffle beyond the groupBy;
    the category table (the encoder artifact) is dimension-sized."""
    o = tables(spark, sf_dir)["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    g = o.agg(
        F.sum(cents).cast("bigint").alias("g_sum_cents"),
        F.count(F.lit(1)).alias("g_n"),
    )
    cat = o.groupBy("o_orderpriority").agg(
        F.sum(cents).cast("bigint").alias("sum_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    return cat.crossJoin(F.broadcast(g)).select(
        "o_orderpriority",
        "n",
        "sum_cents",
        (F.col("sum_cents") * F.col("g_n") + 10 * F.col("g_sum_cents"))
        .cast("bigint")
        .alias("enc_num"),
        ((F.col("n") + 10) * F.col("g_n")).cast("bigint").alias("enc_den"),
    )


@query(
    "q_minmax_scaling",
    oracle="""
    WITH cents AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem
    ),
    bounds AS (
      SELECT l_returnflag, MIN(c) AS lo, MAX(c) AS hi, COUNT(*) AS n
      FROM cents GROUP BY 1
    )
    SELECT c.l_returnflag, b.n, b.lo AS min_cents, b.hi AS max_cents,
           CAST(SUM(((c.c - b.lo) * 1000000) // (b.hi - b.lo)) AS BIGINT)
             AS sum_scaled_ppm
    FROM cents c JOIN bounds b USING (l_returnflag)
    GROUP BY 1, 2, 3, 4
    """,
    tags=("mlops", "scaling", "round7"),
)
def q_minmax_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling in exact integer arithmetic:
    scaled = floor((x - min) * 1e6 / (max - min)) parts-per-million,
    computed per return flag and checksummed (sum of scaled values +
    bounds) so the driver hash pins every scaled value without shipping
    a lineitem-sized result. Floor division keeps both engines
    bit-identical where a double (x-min)/(max-min) would drift.

    Scale shape: bounds are one map-side-combinable agg; the scaled
    pass re-joins them via broadcast (group count is tiny) and
    aggregates map-side again — two scans, one small shuffle, no
    data-scale sort."""
    li = tables(spark, sf_dir)["lineitem"]
    cents = li.select(
        "l_returnflag", F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c")
    )
    bounds = cents.groupBy("l_returnflag").agg(
        F.min("c").alias("lo"), F.max("c").alias("hi"), F.count(F.lit(1)).alias("n")
    )
    joined = cents.join(F.broadcast(bounds), "l_returnflag")
    return (
        joined.select(
            "l_returnflag",
            "n",
            F.col("lo").alias("min_cents"),
            F.col("hi").alias("max_cents"),
            F.expr("((c - lo) * 1000000) div (hi - lo)").alias("scaled"),
        )
        .groupBy("l_returnflag", "n", "min_cents", "max_cents")
        .agg(F.sum("scaled").cast("bigint").alias("sum_scaled_ppm"))
    )


@query(
    "q_systematic_sample",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn FROM orders
    ) WHERE rn % 25 = 1
    """,
    tags=("sampling", "round7"),
)
def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every-k-th) sampling: rank by the primary key and
    keep ranks = 1 mod 25 — the deterministic interval sample auditors
    ask for (every k-th record, not a random k%), complementing the
    hash-Bernoulli / weighted / stratified tier. The key order makes
    the picked set reproducible run-to-run and engine-to-engine.

    Scale shape (round 12): the global rank comes from
    operators/ranks.py's distributed two-phase ranks (one range
    exchange, per-partition windows, driver-side offsets bounded by the
    partition count) — the replan this docstring used to merely
    promise; no single-partition window remains
    (tests/test_single_partition_guard.py sweeps the whole catalog).
    The mod-k filter is map-side after the rank attach."""
    from ..operators.ranks import RANK_COL, with_global_ranks

    o = tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    ranked = with_global_ranks(o, "o_orderkey", "o_orderkey")
    return ranked.filter(F.col(RANK_COL) % 25 == 1).drop(
        RANK_COL, "__range_pid"
    )


@query(
    "q_histogram_2d",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS month,
           CAST(round(o_totalprice * 100) AS BIGINT) // 2500000 AS price_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("aggregation", "histogram", "round7"),
)
def q_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (order month x 25k-dollar price bucket) with counts
    and exact cent mass per cell — the joint-distribution profile step
    (drift monitors and equi-width binning both start here). Bucket
    edges are integer floor divisions; months via date_trunc on both
    engines.

    Scale shape: one map-side-combinable groupBy over composite integer
    keys; cell count is bounded by (months x buckets), independent of
    row count — the canonical cheap-at-any-scale rollup."""
    o = tables(spark, sf_dir)["orders"]
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT) div 2500000").alias(
            "price_bucket"
        ),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).cast("bigint").alias("sum_cents"),
    )
