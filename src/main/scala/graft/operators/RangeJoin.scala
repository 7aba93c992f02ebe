package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Range (interval) join — point-in-interval matching with NO equi key.
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin:
  * O(|L|·|R|) comparisons, fine only while one side broadcasts. The
  * scale path composes existing operators (no custom strategy needed):
  * quantize values and intervals into fixed-width bins, equi-join on
  * the bin id (an ordinary shuffle hash join), then apply the exact
  * range predicate. Candidate work drops from |L|·|R| to
  * Σ_bin |L_bin|·|R_bin| — linear-ish when the bin width matches the
  * interval length (each interval explodes into ceil(len/width)+1
  * bins).
  *
  * This is the same containment-bucketing idea the reference's
  * IntervalJoin/between-optimizations and published range-join
  * implementations use, declared with explode + join so Catalyst/AQE
  * still handle partial aggregation, skew splitting and runtime
  * re-planning. */
object RangeJoin {

  /** Join rows of `points` (value column `v`, LongType units) to rows
    * of `intervals` carrying [`lo`, `hi`) bounds in the same units.
    * `binWidth` should be ~ the typical interval length. */
  def binned(points: DataFrame, v: Column, intervals: DataFrame,
      lo: Column, hi: Column, binWidth: Long): DataFrame = {
    val pb = points.withColumn("_bin", floor(v / binWidth))
    val ib = intervals.withColumn("_bin",
      explode(sequence(floor(lo / binWidth), floor((hi - 1) / binWidth))))
    pb.join(ib, Seq("_bin"))
      .filter(v >= lo && v < hi)
      .drop("_bin")
  }

  /** r01: per-high-value-order count and value of lineitems (ANY
    * order's items — no equi key) shipped the day of the order date.
    * A genuine no-equi-key range join; the naive plan is a nested loop
    * (6k x 600k at sf0.1).
    *
    * Range joins are only cheap when SPARSE: the match count is
    * |L|·|R|·(window/domain), so window width and interval-side
    * selectivity — not the algorithm — decide the cost. An earlier
    * 7-day/all-orders variant of this query was semantically DENSE
    * (~2.5e8 genuine matches at sf0.1, 193 s) — no join algorithm
    * fixes a dense range join; narrow the window or pre-filter the
    * interval side (here: 1 day, high-value orders → 1.4M matches).
    *
    * Plan (round 14): the aggregate is decomposable and the window is
    * BIN-ALIGNED (day-granular dates, one-day window ⟹ the window IS
    * one bin), so the scale-correct plan pre-aggregates the point side
    * PER BIN before the join — the range-join analogue of map-side
    * combine. The sf10 sweep forced this: the pair-enumerating
    * [[binned]] plan's candidate volume is Σ_day |orders_day|·|li_day|,
    * which grows QUADRATICALLY as the fixture densifies (measured 28×
    * on 10× data at 100×, 70 GB of shuffle spill), while the per-bin
    * partial aggregate is one row per day — join work O(|orders|),
    * answer bit-identical because every order joins its whole day.
    * [[binned]] stays the generic path for non-aligned windows
    * (r02/a02 exercise it); a non-decomposable or misaligned window
    * pre-aggregates the FULLY-COVERED bins and joins only the edges. */
  val r01RangeJoin: Q = Q(
    "r01_range_join",
    """SELECT o_orderkey,
      |  count(*) AS n_shipped,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
      |    AS shipped_value
      |FROM orders JOIN lineitem
      |  ON l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 1 DAY
      |WHERE o_totalprice > 480000
      |GROUP BY o_orderkey""".stripMargin) { (s, d) =>
    import s.implicits._
    val day = 86400L
    val li = Tables.lineitem(s, d)
      .select($"l_extendedprice",
        (unix_timestamp($"l_shipdate") / day).cast("long").as("ship_d"))
    val ord = Tables.orders(s, d)
      .filter($"o_totalprice" > 480000)
      .select($"o_orderkey",
        (unix_timestamp($"o_orderdate") / day).cast("long").as("lo_d"))
    // bin-level partial aggregation: one (day, count, decimal-sum) row
    // per ship day, then an equi join — identical answer (the window
    // covers exactly one bin and every order joins its whole day's
    // aggregate), linear work at any density
    val perDay = li.groupBy($"ship_d")
      .agg(count(lit(1)).as("n_shipped"),
        Exact.dsum($"l_extendedprice").as("shipped_value"))
    ord.join(perDay, ord("lo_d") === perDay("ship_d"))
      .select($"o_orderkey", $"n_shipped", $"shipped_value")
  }

  /** Interval×interval OVERLAP join — r01's point-in-interval device
    * generalized to two interval sides: explode BOTH sides into
    * fixed-width bins, equi-join on the bin id, apply the exact
    * overlap predicate, and emit each pair ONLY in the first bin the
    * two intervals share (`_bin = greatest(lo_bin_a, lo_bin_b)` — a
    * qualifying pair matches in exactly one bin, so no distinct, no
    * extra shuffle). Bins are integer epoch seconds; second-truncation
    * is safe for candidate coverage because `x ≤ y ⟹ floor(x) ≤
    * floor(y)` keeps every overlapping pair sharing a bin, and the
    * exact predicate runs on the untruncated timestamps. */
  def binnedOverlap(a: DataFrame, b: DataFrame,
      aLo: Column, aHi: Column, bLo: Column, bHi: Column,
      binWidth: Long): DataFrame = {
    def binsOf(lo: Column, hi: Column) =
      sequence(floor(unix_timestamp(lo) / binWidth),
        floor(unix_timestamp(hi) / binWidth))
    // PRECONDITION lo <= hi, enforced by dropping violations: a
    // descending range would throw inside sequence() and abort the
    // job; an interval with hi < lo is corrupt input, not an interval
    val ab = a.filter(aLo <= aHi)
      .withColumn("_abin0", floor(unix_timestamp(aLo) / binWidth))
      .withColumn("_bin", explode(binsOf(aLo, aHi)))
    val bb = b.filter(bLo <= bHi)
      .withColumn("_bbin0", floor(unix_timestamp(bLo) / binWidth))
      .withColumn("_bin", explode(binsOf(bLo, bHi)))
    ab.join(bb, Seq("_bin"))
      .filter(aLo <= bHi && bLo <= aHi &&
        col("_bin") === greatest(col("_abin0"), col("_bbin0")))
      .drop("_bin", "_abin0", "_bbin0")
  }

  /** r02: session-concurrency audit — for each HIGH-VALUE session
    * (q76's sessions, exact-decimal sess_value > 240), how many OTHER
    * users' sessions overlap it in time and how many distinct users
    * they belong to. A genuine interval×interval join with no equi
    * key: the naive plan is a nested loop over all session pairs; the
    * binned plan's candidate work is Σ_bin |hv_bin|·|sess_bin| with
    * hour bins sized to the session-length scale. The session stage is
    * q76's shared [[Windows.SessionCtes]]/[[Windows.sessionFrame]]
    * VERBATIM, so the whole composition is differential-tested.
    *
    * 100 TB: both explodes add ~1-2 rows per session (hour bins vs
    * minute-scale sessions); the join shuffles on the bin id; density,
    * not the algorithm, bounds the output (r01's lesson) — here the
    * high-value filter keeps the probe side ~1% of sessions. */
  val r02IntervalJoin: Q = Q(
    "r02_interval_join",
    s"""WITH ${Windows.SessionCtes},
      |hv AS (SELECT * FROM sessions WHERE sess_value > 240)
      |SELECT a.user_id, a.sess_id, count(*) AS n_concurrent,
      |  count(DISTINCT b.user_id) AS n_users
      |FROM hv a JOIN sessions b
      |  ON b.user_id <> a.user_id
      | AND b.sess_start <= a.sess_end AND a.sess_start <= b.sess_end
      |GROUP BY a.user_id, a.sess_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val sess = Windows.sessionFrame(s, d)
    val hv = sess.filter($"sess_value" > 240)
      .select($"user_id", $"sess_id",
        $"sess_start".as("a_lo"), $"sess_end".as("a_hi"))
    val other = sess.select($"user_id".as("b_user"),
      $"sess_start".as("b_lo"), $"sess_end".as("b_hi"))
    binnedOverlap(hv, other, $"a_lo", $"a_hi", $"b_lo", $"b_hi",
      binWidth = 3600L)
      .filter($"b_user" =!= $"user_id")
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_concurrent"),
        countDistinct($"b_user").as("n_users"))
  }

  val all: Seq[Q] = Seq(r01RangeJoin, r02IntervalJoin)
}
