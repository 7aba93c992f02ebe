package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.sources.Tables

/** Window functions — the reference's `PTFOperator` +
  * `WindowingTableFunction` surface (SURVEY.md §2.4): ranking, running
  * aggregates, ROWS and RANGE frames, lag/lead, ntile/percent_rank/
  * cume_dist, first/last_value.
  *
  * Scale notes: a window spec shuffles once on `partitionBy` keys and
  * sorts within partitions — identical to the reference's
  * ReduceSink(key=partition, sort=order) + PTF pipeline. Keys chosen here
  * (nationkey, custkey, orderstatus) are bounded-cardinality or
  * well-distributed; no single-partition global windows except where the
  * semantics demand a total order (q17 percent ranks — the reference has
  * the same single-reducer constraint for global ORDER BY, SURVEY.md §2.5).
  */
object Windows {

  /** row_number / rank / dense_rank with deterministic tie-break. */
  val q13WindowRank: Q = Q(
    "q13_window_rank",
    """SELECT c_custkey, c_nationkey, c_acctbal, rn, rk, drk FROM (
      |  SELECT c_custkey, c_nationkey, c_acctbal,
      |    row_number() OVER w AS rn, rank() OVER w AS rk,
      |    dense_rank() OVER w AS drk
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_nationkey
      |               ORDER BY c_acctbal DESC, c_custkey)
      |) WHERE rn <= 3""".stripMargin) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.customer(s, d)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal",
        row_number().over(w).as("rn"), rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .filter($"rn" <= 3)
  }

  /** Running sum + 3-row moving average (ROWS frame). */
  val q14WindowRunning: Q = Q(
    "q14_window_running",
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW), 2) AS running_spend,
      |  round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING
      |    AND CURRENT ROW), 4) AS moving_avg3
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d).select($"o_orderkey", $"o_custkey", $"o_totalprice",
        round(sum($"o_totalprice")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_spend"),
        round(avg($"o_totalprice").over(w.rowsBetween(-2, 0)), 4)
          .as("moving_avg3"))
  }

  /** RANGE frame over a numeric ordering: per customer, that customer's
    * other orders within 10k price below each order. Value-bounded
    * frames are deterministic under ties. Partitioning is per-customer
    * (fine-grained) — a low-cardinality partition key (e.g. the 3-value
    * order status) would serialize the whole table through a handful of
    * window partitions at scale. */
  val q15WindowRange: Q = Q(
    "q15_window_range",
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  count(*) OVER (w RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
      |    AS n_in_band,
      |  round(sum(o_totalprice) OVER (w RANGE BETWEEN 10000 PRECEDING
      |    AND CURRENT ROW), 2) AS band_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
      Tables.orders(s, d).select($"o_orderkey", $"o_custkey",
        $"o_totalprice",
        count(lit(1)).over(w).as("n_in_band"),
        round(sum($"o_totalprice").over(w), 2).as("band_spend"))
  }

  /** lag / lead with default null-extension at partition edges. */
  val q16LagLead: Q = Q(
    "q16_lag_lead",
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  lead(o_totalprice) OVER w AS next_price,
      |  round(o_totalprice - lag(o_totalprice) OVER w, 2) AS delta_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d).select($"o_orderkey", $"o_custkey", $"o_totalprice",
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"),
        round($"o_totalprice" - lag($"o_totalprice", 1).over(w), 2)
          .as("delta_prev"))
  }

  /** ntile / percent_rank / cume_dist over a global ordering. The global
    * window is the semantic requirement here (like the reference's
    * single-reducer ORDER BY); at 100 TB this query would be rewritten
    * over a partitioned key or approximated with percentile sketches. */
  val q17NtileStats: Q = Q(
    "q17_ntile_stats",
    """SELECT c_custkey, c_acctbal,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal, c_custkey)""".stripMargin) { (s, d) =>
    import s.implicits._
    val w = Window.orderBy($"c_acctbal".asc, $"c_custkey".asc)
    Tables.customer(s, d).select($"c_custkey", $"c_acctbal",
      ntile(4).over(w).as("quartile"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume"))
  }

  /** first_value / last_value with an explicit full-partition frame
    * (last_value over the default frame is a classic footgun — the frame
    * must extend to UNBOUNDED FOLLOWING to mean "partition max"). */
  val q18FirstLast: Q = Q(
    "q18_first_last",
    """SELECT s_suppkey, s_nationkey, s_acctbal,
      |  first_value(s_acctbal) OVER w AS nation_min,
      |  last_value(s_acctbal) OVER w AS nation_max
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"s_nationkey")
        .orderBy($"s_acctbal".asc, $"s_suppkey".asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.supplier(s, d).select($"s_suppkey", $"s_nationkey", $"s_acctbal",
        first_value($"s_acctbal").over(w).as("nation_min"),
        last_value($"s_acctbal").over(w).as("nation_max"))
  }

  /** q62: time-INTERVAL range frame — 30-day trailing order count and
    * exact-decimal spend per customer. The SQL text uses the standard
    * `RANGE BETWEEN INTERVAL 30 DAY PRECEDING` (a WINDOW clause both
    * engines parse); the DSL expresses the identical frame as
    * rangeBetween over the epoch-seconds cast, Spark's canonical form
    * for interval frames. RANGE includes order-date peers in both
    * engines, so ties agree. Frame sums stay in decimal space →
    * bit-identical trailing spend. */
  val q62IntervalFrame: Q = Q(
    "q62_interval_frame",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  count(*) OVER w AS n_trailing,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
      |    AS trailing_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING
      |               AND CURRENT ROW)""".stripMargin) { (s, d) =>
    import s.implicits._
    // TIMESTAMP_NTZ has no direct long cast; go via TIMESTAMP (session
    // tz is pinned UTC in GraftSession, so the epoch mapping is fixed)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".cast("timestamp").cast("long"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(s, d)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        count(lit(1)).over(w).as("n_trailing"),
        sum($"o_totalprice".cast("decimal(18,6)")).over(w)
          .cast("double").as("trailing_spend"))
  }

  /** q76: batch sessionization (gaps-and-islands) — the classic
    * lag-flag-then-running-sum pattern: a session break is a >30 min
    * gap per user; the running sum of break flags numbers the
    * sessions; one group-by rolls sessions up. The streaming twin is
    * st03 (`session_window`); this is the batch/backfill formulation
    * every training-data pipeline runs over historical event logs.
    *
    * 100 TB shape: both windows and the final group-by partition by
    * user_id — ONE shuffle total (the windows share the partitioning,
    * and the group-by key (user_id, sess_id) is a refinement of it, so
    * Catalyst reuses the exchange). Per-user state is a sort, not a
    * buffer-everything window (running frame is incremental). Order is
    * pinned by (ts, event_id) so tied timestamps don't flap the
    * session numbering between runs or engines. */
  /** q76's sessionization as a shared CTE block (no leading WITH),
    * ending in `sessions` = one row per (user_id, sess_id) with
    * n_events, sess_start/sess_end and the exact-decimal sess_value.
    * One string object shared by q76 and r02's interval-overlap join
    * (the LshCcCtes discipline); declared above its consumers. */
  val SessionCtes: String =
    """flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM flagged),
      |sessions AS (
      |  SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
      |    count(*) AS n_events, min(ts) AS sess_start,
      |    max(ts) AS sess_end,
      |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sess_value
      |  FROM sess GROUP BY user_id, sess_id)""".stripMargin

  /** The Spark twin of [[SessionCtes]] — the one session frame q76
    * registers and r02 joins over. */
  def sessionFrame(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("brk",
        when(lag($"ts", 1).over(w).isNull ||
          $"ts" - lag($"ts", 1).over(w) > expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum($"brk").over(run))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"), min($"ts").as("sess_start"),
        max($"ts").as("sess_end"), Exact.dsum($"value").as("sess_value"))
  }

  lazy val q76Sessionize: Q = Q(
    "q76_sessionize",
    s"""WITH $SessionCtes
      |SELECT user_id, sess_id, n_events, sess_start, sess_end,
      |  sess_value
      |FROM sessions""".stripMargin) { (s, d) =>
    sessionFrame(s, d)
  }

  /** q77: IGNORE NULLS window navigation (the reference's
    * first_value/last_value/lag/lead null-skipping mode plus
    * nth_value) — the gap-filling idiom: carry the last known
    * non-null value forward per partition. Nulls are synthesized from
    * open orders so the skip behavior is actually exercised; order is
    * pinned by (o_orderdate, o_orderkey). Same one-shuffle shape as
    * every per-customer window. */
  lazy val q77IgnoreNulls: Q = Q(
    "q77_ignore_nulls",
    """WITH t AS (
      |  SELECT o_orderkey, o_custkey, o_orderdate,
      |    CASE WHEN o_orderstatus = 'O' THEN NULL
      |         ELSE o_totalprice END AS v
      |  FROM orders)
      |SELECT o_orderkey, o_custkey,
      |  lag(v IGNORE NULLS) OVER w AS prev_filled,
      |  last_value(v IGNORE NULLS) OVER w AS fill_forward,
      |  nth_value(v, 2 IGNORE NULLS) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |    AS second_filled
      |FROM t
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey
      |             ROWS UNBOUNDED PRECEDING)""".stripMargin) { (s, d) =>
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.orders(s, d)
      .withColumn("v",
        when($"o_orderstatus" === "O", lit(null)).otherwise($"o_totalprice"))
      .select($"o_orderkey", $"o_custkey",
        lag($"v", 1, null, ignoreNulls = true).over(w).as("prev_filled"),
        last($"v", ignoreNulls = true).over(run).as("fill_forward"),
        nth_value($"v", 2, ignoreNulls = true).over(full)
          .as("second_filled"))
  }

  /** q79: TPC-DS Q51 shape — two channels aggregated independently,
    * FULL OUTER joined on the shared time axis, then parallel
    * cumulative sums computed over the joined axis (coalescing the
    * channel a day is missing from to zero) with a crossover flag
    * where one channel's cumulative overtakes the other. Cumulative
    * sums stay DECIMAL through the running window (order-fixed frame,
    * but decimal also survives any engine's frame evaluation strategy)
    * and the overtake comparison runs on the exact decimals, so the
    * boolean can't flip on a last-ulp tie.
    *
    * The unpartitioned window is over the DAY rollup — cardinality =
    * distinct days, already collapsed by the per-channel aggregates —
    * never over raw events (same discipline as q78; contrast q17's
    * documented raw-row global window). */
  lazy val q79CumulativeCrossover: Q = Q(
    "q79_cumulative_crossover",
    """WITH v AS (SELECT CAST(ts AS DATE) AS day,
      |    sum(CAST(value AS DECIMAL(18,6))) AS v_dec
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |p AS (SELECT CAST(ts AS DATE) AS day,
      |    sum(CAST(value AS DECIMAL(18,6))) AS p_dec
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |j AS (SELECT coalesce(v.day, p.day) AS day, v_dec, p_dec
      |      FROM v FULL JOIN p ON v.day = p.day)
      |SELECT day,
      |  CAST(sum(coalesce(v_dec, 0)) OVER w AS DOUBLE) AS cum_view,
      |  CAST(sum(coalesce(p_dec, 0)) OVER w AS DOUBLE) AS cum_purchase,
      |  sum(coalesce(p_dec, 0)) OVER w > sum(coalesce(v_dec, 0)) OVER w
      |    AS purchase_ahead
      |FROM j
      |WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val e = Tables.events(s, d)
      def daily(kind: String, alias: String) =
        e.filter($"event_type" === kind)
          .groupBy(to_date($"ts").as("day"))
          .agg(Exact.dsumDec($"value").as(alias))
      val j = daily("view", "v_dec")
        .join(daily("purchase", "p_dec"), Seq("day"), "full_outer")
      val w = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cumV = sum(coalesce($"v_dec", lit(0))).over(w)
      val cumP = sum(coalesce($"p_dec", lit(0))).over(w)
      j.select($"day", cumV.cast("double").as("cum_view"),
        cumP.cast("double").as("cum_purchase"),
        (cumP > cumV).as("purchase_ahead"))
  }

  /** matchpath-lite (reference MatchPath PTF — the last §2.4 item with
    * no functional equivalent until now): match a chain of CONSECUTIVE
    * symbols over each partition's time-ordered rows and emit one row
    * per match start with the span's end coordinates. This is the
    * literal-chain core of the PTF; arbitrary `sym*` quantifiers are
    * [[matchPathQuant]], which generalizes this same one-window
    * scheme. The NFA is a
    * conjunction of lead() lookaheads over ONE window — a single
    * shuffle on the partition key, no self-joins, WindowExec streams
    * each partition once. Overlapping matches are all emitted
    * (matchpath semantics: every row can start a path). */
  def matchPath(events: org.apache.spark.sql.DataFrame,
      pattern: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(pattern.nonEmpty, "empty symbol pattern")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val isMatch = pattern.zipWithIndex.map { case (sym, i) =>
      lead(col("event_type"), i).over(w) === sym
    }.reduce(_ && _)
    events
      .withColumn("end_event", lead(col("event_id"), pattern.size - 1).over(w))
      .withColumn("end_ts", lead(col("ts"), pattern.size - 1).over(w))
      .withColumn("m", isMatch)
      .filter(col("m"))
      .select(col("user_id"), col("event_id").as("start_event"),
        col("ts").as("start_ts"), col("end_event"), col("end_ts"))
  }

  /** matchpath star-quantifier shape `A.B*.C` (zero or more B between
    * A and C, all consecutive) — the funnel-with-noise pattern (e.g.
    * view, any clicks, purchase). One window, no NFA state: for each
    * row, `last_value(..., ignoreNulls=true)` over the preceding rows
    * yields the nearest preceding NON-B symbol and its coordinates;
    * every row between that row and the current one is B by
    * construction, so consecutiveness needs no extra check. A match
    * ends at a C whose nearest preceding non-B symbol is A. Same
    * scale shape as [[matchPath]]: one shuffle on the partition key. */
  def matchPathStar(events: org.apache.spark.sql.DataFrame,
      pre: String, star: String, post: String)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def lastNonStar(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      last(when(col("event_type") =!= star, c), ignoreNulls = true).over(w)
    events
      .withColumn("p_sym", lastNonStar(col("event_type")))
      .withColumn("p_event", lastNonStar(col("event_id")))
      .withColumn("p_ts", lastNonStar(col("ts")))
      .filter(col("event_type") === post && col("p_sym") === pre)
      .select(col("user_id"), col("p_event").as("start_event"),
        col("p_ts").as("start_ts"), col("event_id").as("end_event"),
        col("ts").as("end_ts"))
  }

  /** General quantified row-pattern matching — arbitrary chains of
    * `sym`, `sym*` and `sym+` tokens (e.g.
    * `view.click*.view.click+.purchase`), subsuming [[matchPath]] (all
    * literals) and [[matchPathStar]] (one star). Grammar:
    * `(sym | sym* | sym+)+` with `s+` rewritten to `s.s*`. Quantified
    * runs may be ADJACENT (`a*.b*.c`, `a+.b*`) and the pattern may end
    * in any number of trailing runs; see [[MatchPattern]] for the
    * COMMITTED matching rules (literal-first, greedy forced extent, no
    * backtracking — deterministic, at most one match per start row)
    * and the vacuous shapes that are rejected as typo guards (bare
    * all-quantified patterns; a run whose name-symbol its unit's
    * literal or predecessor run starves). (SURVEY.md §2.4.)
    *
    * Compilation: tokens group into units `(star-chain, literal)` plus
    * the TRAILING run chain; units compile BACKWARD into per-row
    * columns E_k = "a match of units k..K starts exactly at this row"
    * carrying the match-end coordinates. Within a unit the star chain
    * also folds backward — F_i = "the decision at this row with runs
    * i..q and the literal remaining": the literal branch wins first
    * (committed zero-length chain), else run i hops over its maximal
    * extent with one `first_value(ignoreNulls)` probe over the
    * FOLLOWING frame to the first non-run row's F_{i+1}, else the
    * decision falls through to F_{i+1} at the same row (run i empty,
    * try the next run). The probe stops at — never skips — a
    * non-continuing row because it probes the F_{i+1} STRUCT, which is
    * non-null at every non-run row even when its fields (the dead
    * match) are null; no in-band sentinel value, so no collision with
    * real data. The last unit's literal is row-local; earlier literals
    * hop to the next row's E_{k+1} via `lead()`.
    *
    * The trailing run chain compiles as backward columns G_i = "end
    * coordinates of the maximal chain of runs i..m starting AT this
    * row, where the previous row is the fallback end": run-END rows
    * (a run row whose successor is not one — `lead()`) carry
    * `lead(G_{i+1})` (the chain continues after the run) coalesced
    * with their own coordinates (partition end inside the run), a
    * non-run row falls through to G_{i+1} at the same row, and the
    * base case is the previous row's coordinates (`lag()`) — so a
    * chain that consumes nothing lands exactly on the final literal.
    * The anchor at the last literal reads `lead(G_1)` coalesced with
    * its own coordinates.
    *
    * Scale shape: every layer shares ONE window spec (partitionBy
    * user_id, orderBy ts, event_id), so the whole pattern — any
    * length — runs as ONE hash-partition exchange and ONE sort;
    * dependent layers stack as sort-free streaming WindowExec nodes
    * over the same partitioning (PlanSpec pins 1 exchange + 1 sort
    * for q80c). */
  def matchPathQuant(events: org.apache.spark.sql.DataFrame,
      rawTokens: Seq[String]): org.apache.spark.sql.DataFrame =
    matchPathQuant(events, rawTokens, Map.empty)

  /** [[matchPathQuant]] with SYMBOL DEFINITIONS — the reference PTF's
    * full calling convention: a pattern symbol may be defined by an
    * arbitrary boolean expression over the row (the reference's
    * `matchpath(..., 'LATE', arrival_delay > 15, ...)` argument
    * pairs), not just equality on `event_type`. Symbols absent from
    * the map keep the default `event_type = name` meaning, so the
    * 2-arg form is the all-default special case.
    *
    * Predicate semantics: a null predicate result counts as false
    * (SQL boolean semantics would otherwise make the star-run probe
    * SKIP the row instead of stopping at it). If a run predicate and
    * its anchor literal's predicate OVERLAP — which the name-
    * distinctness rule rules out for name symbols but cannot be
    * checked statically for predicates — the committed semantics
    * stay well-defined: at a decision row the LITERAL wins (a row
    * satisfying both anchors a zero-length chain there), while a row
    * consumed INSIDE a run never terminates it early even when it
    * also satisfies the literal (the run's extent is forced;
    * MatchPathSpec pins both). Keep run and anchor predicates
    * disjoint for reference-identical behavior. */
  def matchPathQuant(events: org.apache.spark.sql.DataFrame,
      rawTokens: Seq[String],
      symbols: Map[String, org.apache.spark.sql.Column])
      : org.apache.spark.sql.DataFrame = {
    // grammar + validation live in MatchPattern, SHARED with the
    // streaming QuantFunnelProcessor (st13) so batch and stream can
    // never diverge on which patterns they accept
    val compiled = MatchPattern.compile(rawTokens)
    MatchPattern.requireSymbolsUsed(compiled, symbols.keySet, rawTokens)
    val units = compiled.units
    val tails = compiled.tails
    type C = org.apache.spark.sql.Column
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wFol1 = w.rowsBetween(1, Window.unboundedFollowing)
    val wFol0 = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // symbol -> row predicate; default is event_type equality. BOTH
    // paths null-coalesce: a null predicate result (null event_type,
    // or a definition over a nullable column) must count as false, or
    // the run probes' IGNORE NULLS would SKIP the row instead of
    // stopping at it
    def predOf(name: String): C =
      coalesce(symbols.getOrElse(name, col("event_type") === name),
        lit(false))
    def ownCoords: C =
      struct(col("event_id").as("ee"), col("ts").as("ts"))
    var df = events
    // ---- trailing run chain: G_i = end coords of the maximal chain
    // of runs i..m starting AT this row, fallback end = previous row
    // (see the scaladoc). G_{m+1} = lag coords; the anchor at the last
    // literal reads lead(G_1) coalesced with its own coordinates.
    val tailEnd: Option[(C, C)] = if (tails.isEmpty) None else Some {
      df = df.withColumn("__mp_prev",
        struct(lag(col("event_id"), 1).over(w).as("ee"),
          lag(col("ts"), 1).over(w).as("ts")))
      var g: C = col("__mp_prev")
      for ((tSym, i) <- tails.zipWithIndex.reverse) {
        val tp = predOf(tSym)
        df = df.withColumn(s"__mp_tp_$i", tp)
        // run-END rows: a run row whose successor is not one (null
        // lead = partition end = run end)
        df = df.withColumn(s"__mp_tre_$i", col(s"__mp_tp_$i") &&
          !coalesce(lead(col(s"__mp_tp_$i"), 1).over(w), lit(false)))
        df = df.withColumn(s"__mp_tg1_$i", g)
        df = df.withColumn(s"__mp_th_$i", when(col(s"__mp_tre_$i"),
          coalesce(lead(col(s"__mp_tg1_$i"), 1).over(w), ownCoords)))
        df = df.withColumn(s"__mp_tg_$i",
          when(col(s"__mp_tp_$i"),
            first(col(s"__mp_th_$i"), ignoreNulls = true).over(wFol0))
            .otherwise(col(s"__mp_tg1_$i")))
        g = col(s"__mp_tg_$i")
      }
      df = df.withColumn("__mp_tailend",
        coalesce(lead(g, 1).over(w), ownCoords))
      (col("__mp_tailend").getField("ee"),
        col("__mp_tailend").getField("ts"))
    }
    var ee = ""; var ets = "" // E_{k+1} column names while folding back
    for (k <- units.indices.reverse) {
      val u = units(k)
      val lp = predOf(u.sym)
      // the literal's continuation: for the LAST unit the row itself
      // (or the trailing chain's end coordinates); earlier literals
      // hop to the next row's E_{k+1}
      val (contEe, contTs) =
        if (k == units.size - 1) tailEnd match {
          case None => (col("event_id"), col("ts"))
          case Some((te, tt)) => (te, tt)
        }
        else (lead(col(ee), 1).over(w), lead(col(ets), 1).over(w))
      // F_i backward over the unit's star chain: literal-first commit,
      // else run i probes over its maximal extent, else fall through
      // to F_{i+1} at the same row (run i empty). The probe reads the
      // F_{i+1} STRUCT: non-null at every non-run row even when its
      // fields are null, so a failing probe row stops the scan (its
      // null fields kill the match) instead of being skipped — and no
      // in-band sentinel value can collide with real data (an
      // event_id of -1 is legal input; an earlier formulation
      // coalesced to -1L and silently killed such matches).
      var fEe: C = when(lp, contEe)
      var fTs: C = when(lp, contTs)
      for ((sSym, si) <- u.stars.zipWithIndex.reverse) {
        val sp = predOf(sSym)
        df = df.withColumn(s"__mp_f_${k}_$si",
          struct(fEe.as("ee"), fTs.as("ts")))
        df = df.withColumn(s"__mp_fp_${k}_$si",
          first(when(!sp, col(s"__mp_f_${k}_$si")), ignoreNulls = true)
            .over(wFol1))
        val fNext = col(s"__mp_f_${k}_$si")
        val probe = col(s"__mp_fp_${k}_$si")
        fEe = when(lp, contEe).when(sp, probe.getField("ee"))
          .otherwise(fNext.getField("ee"))
        fTs = when(lp, contTs).when(sp, probe.getField("ts"))
          .otherwise(fNext.getField("ts"))
      }
      ee = s"__mp_e_ee_$k"; ets = s"__mp_e_ts_$k"
      df = df.withColumn(ee, fEe).withColumn(ets, fTs)
    }
    df.filter(col(ee).isNotNull)
      .select(col("user_id"), col("event_id").as("start_event"),
        col("ts").as("start_ts"), col(ee).as("end_event"),
        col(ets).as("end_ts"))
  }

  /** q80c: the two-star funnel `view.click*.view.click*.purchase`
    * through [[matchPathQuant]] — the arbitrary-quantifier depth the
    * literal chain (q80) and single star (q80b) don't reach. The
    * oracle transliterates the same backward unit compilation into
    * windowed CTEs (window functions can't nest in one SELECT, so
    * each layer is a CTE — exactly the engine's own layering). */
  val q80cMatchPathQuant: Q = Q(
    "q80c_matchpath_quant",
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |u3a AS (SELECT *,
      |    CASE WHEN event_type = 'purchase' THEN event_id END AS a3_ee,
      |    CASE WHEN event_type = 'purchase' THEN ts END AS a3_ts
      |  FROM e),
      |u3 AS (SELECT *,
      |    first_value(CASE WHEN event_type <> 'click'
      |      THEN coalesce(a3_ee, -1) END IGNORE NULLS) OVER wf AS f3_ee,
      |    first_value(CASE WHEN event_type <> 'click'
      |      THEN coalesce(a3_ts, TIMESTAMP '1900-01-01') END IGNORE NULLS)
      |      OVER wf AS f3_ts
      |  FROM u3a
      |  WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
      |e3 AS (SELECT *,
      |    CASE WHEN event_type = 'purchase' THEN a3_ee
      |         WHEN event_type = 'click' AND f3_ee <> -1 THEN f3_ee
      |    END AS e3_ee,
      |    CASE WHEN event_type = 'purchase' THEN a3_ts
      |         WHEN event_type = 'click' AND f3_ee <> -1 THEN f3_ts
      |    END AS e3_ts
      |  FROM u3),
      |u2a AS (SELECT *,
      |    CASE WHEN event_type = 'view' THEN lead(e3_ee, 1) OVER wl
      |    END AS a2_ee,
      |    CASE WHEN event_type = 'view' THEN lead(e3_ts, 1) OVER wl
      |    END AS a2_ts
      |  FROM e3
      |  WINDOW wl AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |u2 AS (SELECT *,
      |    first_value(CASE WHEN event_type <> 'click'
      |      THEN coalesce(a2_ee, -1) END IGNORE NULLS) OVER wf AS f2_ee,
      |    first_value(CASE WHEN event_type <> 'click'
      |      THEN coalesce(a2_ts, TIMESTAMP '1900-01-01') END IGNORE NULLS)
      |      OVER wf AS f2_ts
      |  FROM u2a
      |  WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
      |e2 AS (SELECT *,
      |    CASE WHEN event_type = 'view' THEN a2_ee
      |         WHEN event_type = 'click' AND f2_ee <> -1 THEN f2_ee
      |    END AS e2_ee,
      |    CASE WHEN event_type = 'view' THEN a2_ts
      |         WHEN event_type = 'click' AND f2_ee <> -1 THEN f2_ts
      |    END AS e2_ts
      |  FROM u2),
      |e1 AS (SELECT *,
      |    CASE WHEN event_type = 'view' THEN lead(e2_ee, 1) OVER wl
      |    END AS e1_ee,
      |    CASE WHEN event_type = 'view' THEN lead(e2_ts, 1) OVER wl
      |    END AS e1_ts
      |  FROM e2
      |  WINDOW wl AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, event_id AS start_event, ts AS start_ts,
      |  e1_ee AS end_event, e1_ts AS end_ts
      |FROM e1 WHERE e1_ee IS NOT NULL""".stripMargin) { (s, d) =>
    matchPathQuant(Tables.events(s, d),
      Seq("view", "click*", "view", "click*", "purchase"))
  }

  /** q80d: the one-or-more funnel `view.click+.purchase` through
    * [[matchPathQuant]]'s `+` rewrite (`click+` == `click.click*`).
    * The oracle deliberately derives the SAME semantics a different
    * way than the engine's backward unit compilation: a purchase
    * matches iff its IMMEDIATE predecessor is a click (the >= 1 part)
    * and its nearest preceding non-click row is a view (the run part,
    * q80b's last_value trick) — so the two independent formulations
    * must land on identical rows, start coordinates included. */
  val q80dMatchPathPlus: Q = Q(
    "q80d_matchpath_plus",
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |m AS (SELECT user_id, event_id, event_type, ts,
      |        lag(event_type, 1) OVER w0 AS l_sym,
      |        last_value(CASE WHEN event_type <> 'click'
      |                        THEN event_type END IGNORE NULLS) OVER w
      |          AS p_sym,
      |        last_value(CASE WHEN event_type <> 'click'
      |                        THEN event_id END IGNORE NULLS) OVER w
      |          AS p_event,
      |        last_value(CASE WHEN event_type <> 'click'
      |                        THEN ts END IGNORE NULLS) OVER w AS p_ts
      |      FROM e
      |      WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id),
      |             w AS (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING
      |                   AND 1 PRECEDING))
      |SELECT user_id, p_event AS start_event, p_ts AS start_ts,
      |  event_id AS end_event, ts AS end_ts
      |FROM m WHERE event_type = 'purchase' AND l_sym = 'click'
      |  AND p_sym = 'view'""".stripMargin) { (s, d) =>
    matchPathQuant(Tables.events(s, d),
      Seq("view", "click+", "purchase"))
  }

  /** q80e: predicate-defined symbols — the reference PTF's full
    * calling convention, where a pattern symbol is an arbitrary
    * boolean expression over the row rather than an event-type name:
    * `bigv` is a view with value >= 30 (about half of all views), and
    * the funnel is bigv.click*.purchase. The oracle is q80b's
    * last_value formulation with the predicate folded into the
    * carried flag — an independent derivation of the same semantics,
    * exercising that the probe layers gate on the PREDICATE, not on
    * the symbol name. */
  val q80eMatchPathSymbols: Q = Q(
    "q80e_matchpath_symbols",
    """WITH e AS (SELECT user_id, event_id, event_type, value,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |m AS (SELECT user_id, event_id, event_type, ts,
      |        last_value(CASE WHEN NOT (event_type = 'click')
      |                        THEN CASE WHEN event_type = 'view'
      |                                   AND value >= 30.0
      |                             THEN 1 ELSE 0 END
      |                   END IGNORE NULLS) OVER w AS p_big,
      |        last_value(CASE WHEN NOT (event_type = 'click')
      |                        THEN event_id END IGNORE NULLS) OVER w
      |          AS p_event,
      |        last_value(CASE WHEN NOT (event_type = 'click')
      |                        THEN ts END IGNORE NULLS) OVER w AS p_ts
      |      FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING
      |                   AND 1 PRECEDING))
      |SELECT user_id, p_event AS start_event, p_ts AS start_ts,
      |  event_id AS end_event, ts AS end_ts
      |FROM m WHERE event_type = 'purchase' AND p_big = 1""".stripMargin
    ) { (s, d) =>
    import org.apache.spark.sql.functions.{col, lit}
    matchPathQuant(Tables.events(s, d),
      Seq("bigv", "click*", "purchase"),
      Map("bigv" -> (col("event_type") === "view" &&
        col("value") >= lit(30.0))))
  }

  /** q80f: the TRAILING-quantifier funnel `view.click+` — "a view then
    * any nonempty run of clicks", no closing literal (the round-5
    * verdict's last semantics gap: the reference PTF accepts patterns
    * ending in a quantified run, e.g. a standalone `LATE+`). The match
    * ends at the LAST click of the maximal run. The oracle derives the
    * same semantics from the opposite end: a match END is a run-END
    * click (its successor is not a click — or nothing follows) whose
    * nearest preceding non-click row is a view; start = that view.
    * The two formulations — engine scans FORWARD from the start via
    * the run-end probe, oracle scans BACKWARD from the end via
    * last_value — must land on identical (start, end) pairs. */
  val q80fMatchPathTrailing: Q = Q(
    "q80f_matchpath_trailing",
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |m AS (SELECT user_id, event_id, event_type, ts,
      |        lead(event_type, 1) OVER w0 AS n_sym,
      |        last_value(CASE WHEN event_type <> 'click'
      |                        THEN event_type END IGNORE NULLS) OVER w
      |          AS p_sym,
      |        last_value(CASE WHEN event_type <> 'click'
      |                        THEN event_id END IGNORE NULLS) OVER w
      |          AS p_event,
      |        last_value(CASE WHEN event_type <> 'click'
      |                        THEN ts END IGNORE NULLS) OVER w AS p_ts
      |      FROM e
      |      WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id),
      |             w AS (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING
      |                   AND 1 PRECEDING))
      |SELECT user_id, p_event AS start_event, p_ts AS start_ts,
      |  event_id AS end_event, ts AS end_ts
      |FROM m WHERE event_type = 'click'
      |  AND (n_sym IS NULL OR n_sym <> 'click')
      |  AND p_sym = 'view'""".stripMargin) { (s, d) =>
    matchPathQuant(Tables.events(s, d), Seq("view", "click+"))
  }

  /** q80g: ADJACENT quantified runs `view.click*.error*.purchase` —
    * the committed chain semantics (previously rejected; closed this
    * round). The oracle derives the same semantics BACKWARD and
    * independently of the engine's forward probe layers: a purchase
    * row ends a match iff its nearest preceding non-run row is a view
    * (q80b's last_value carry) and the run span between them contains
    * no committed-order BREAKER — an error directly followed by a
    * click, the one boundary the chain click*.error* cannot produce —
    * counted by a running sum compared against the carried sum at the
    * span's start. Two formulations, one row set. */
  val q80gMatchPathChain: Q = Q(
    "q80g_matchpath_chain",
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |m AS (SELECT *, CASE WHEN event_type = 'click'
      |          AND lag(event_type) OVER w0 = 'error'
      |        THEN 1 ELSE 0 END AS br
      |      FROM e
      |      WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |c AS (SELECT *, sum(br) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS cum
      |      FROM m),
      |r AS (SELECT *,
      |    last_value(CASE WHEN event_type NOT IN ('click', 'error')
      |                    THEN event_type END IGNORE NULLS) OVER w
      |      AS p_sym,
      |    last_value(CASE WHEN event_type NOT IN ('click', 'error')
      |                    THEN event_id END IGNORE NULLS) OVER w
      |      AS p_event,
      |    last_value(CASE WHEN event_type NOT IN ('click', 'error')
      |                    THEN ts END IGNORE NULLS) OVER w AS p_ts,
      |    last_value(CASE WHEN event_type NOT IN ('click', 'error')
      |                    THEN cum END IGNORE NULLS) OVER w AS p_cum
      |  FROM c
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT user_id, p_event AS start_event, p_ts AS start_ts,
      |  event_id AS end_event, ts AS end_ts
      |FROM r WHERE event_type = 'purchase' AND p_sym = 'view'
      |  AND cum = p_cum""".stripMargin) { (s, d) =>
    matchPathQuant(Tables.events(s, d),
      Seq("view", "click*", "error*", "purchase"))
  }

  /** q80b: view→click*→purchase through [[matchPathStar]]. */
  val q80bMatchPathStar: Q = Q(
    "q80b_matchpath_star",
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |m AS (SELECT user_id, event_id, event_type, ts,
      |        last_value(CASE WHEN event_type <> 'click'
      |                        THEN event_type END IGNORE NULLS) OVER w
      |          AS p_sym,
      |        last_value(CASE WHEN event_type <> 'click'
      |                        THEN event_id END IGNORE NULLS) OVER w
      |          AS p_event,
      |        last_value(CASE WHEN event_type <> 'click'
      |                        THEN ts END IGNORE NULLS) OVER w AS p_ts
      |      FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING
      |                   AND 1 PRECEDING))
      |SELECT user_id, p_event AS start_event, p_ts AS start_ts,
      |  event_id AS end_event, ts AS end_ts
      |FROM m
      |WHERE event_type = 'purchase' AND p_sym = 'view'""".stripMargin) {
    (s, d) =>
    matchPathStar(Tables.events(s, d), "view", "click", "purchase")
  }

  /** q80: the view→view→purchase funnel through [[matchPath]]. */
  val q80MatchPath: Q = Q(
    "q80_matchpath_funnel",
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |m AS (SELECT user_id, event_id, ts,
      |        event_type AS s0,
      |        lead(event_type, 1) OVER w AS s1,
      |        lead(event_type, 2) OVER w AS s2,
      |        lead(event_id, 2) OVER w AS end_event,
      |        lead(ts, 2) OVER w AS end_ts
      |      FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, event_id AS start_event, ts AS start_ts,
      |  end_event, end_ts
      |FROM m
      |WHERE s0 = 'view' AND s1 = 'view' AND s2 = 'purchase'"""
      .stripMargin) { (s, d) =>
    matchPath(Tables.events(s, d), Seq("view", "view", "purchase"))
  }

  val all: Seq[Q] = Seq(q13WindowRank, q14WindowRunning, q15WindowRange,
    q16LagLead, q17NtileStats, q17aQuartileBucketed, q18FirstLast,
    q62IntervalFrame, q76Sessionize, q77IgnoreNulls,
    q79CumulativeCrossover, q80MatchPath, q80bMatchPathStar,
    q80cMatchPathQuant, q80dMatchPathPlus, q80eMatchPathSymbols,
    q80fMatchPathTrailing, q80gMatchPathChain)

  /** q17a: the SCALE PATH for q17's global ntile — quartile assignment
    * without any global window. Boundaries come from one bounded-memory
    * `approx_percentile` aggregate (a 3-value row, broadcast); the
    * assignment is a map-only comparison. q17's total-order window
    * serializes the table through one reducer (documented conscious
    * trade-off); this formulation is O(n) map work + one sketch
    * aggregate at any scale. Sketch boundaries are engine-specific, so
    * the oracle pins the distribution VERDICT (each quartile holds
    * 15-35% of rows) rather than values — driver-green means the
    * bucketing works. */
  lazy val q17aQuartileBucketed: Q = Q(
    "q17a_quartile_bucketed",
    """SELECT CAST(unnest(range(1, 5)) AS INT) AS quartile,
      |  true AS size_ok FROM (SELECT 1)""".stripMargin) { (s, d) =>
    import s.implicits._
    val cust = Tables.customer(s, d)
    val bounds = cust.agg(percentile_approx($"c_acctbal",
      array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("b"))
    val totals = cust.agg(count(lit(1)).as("total"))
    cust.crossJoin(broadcast(bounds))
      .select($"c_custkey",
        (lit(1) + ($"c_acctbal" > element_at($"b", 1)).cast("int")
          + ($"c_acctbal" > element_at($"b", 2)).cast("int")
          + ($"c_acctbal" > element_at($"b", 3)).cast("int"))
          .as("quartile"))
      .groupBy($"quartile")
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(totals))
      .select($"quartile",
        ($"n" >= $"total" * 0.15 && $"n" <= $"total" * 0.35).as("size_ok"))
  }
}
