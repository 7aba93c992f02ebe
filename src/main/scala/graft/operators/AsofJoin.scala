package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.sources.Tables

/** As-of (temporal) join — an operator the reference LACKS entirely
  * (SURVEY.md §2.1: "No range/as-of/interval join exists in the
  * reference") but that time-series/event pipelines need constantly.
  *
  * Per the decision ladder (SURVEY.md §7.3 / guide preference (a)):
  * composition expresses the semantics exactly, so no custom physical
  * operator is needed. The implementation is the production
  * union-and-carry pattern:
  *
  *   1. tag right rows (side=0) and left rows (side=1), union
  *   2. one shuffle+sort on (key, ts, side)
  *   3. carry the last non-null right payload forward with
  *      last(ignoreNulls) over an unbounded-preceding window
  *   4. keep left rows with a carried match
  *
  * Cost: ONE shuffle of |L|+|R| and a partition-local sort — the same
  * lower bound a dedicated as-of merge operator pays. At equal
  * timestamps the right row sorts first, giving `>=` (inclusive)
  * semantics — identical to DuckDB's native ASOF JOIN, which is the
  * oracle. */
object AsofJoin {

  /** Generic as-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` on the same key. Right must be unique per
    * (key, ts) — pre-aggregate it otherwise. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, outer: Boolean = false): DataFrame = {
    val s = left.sparkSession
    import s.implicits._
    val rightPayloadCols = right.columns.filter(c => c != key && c != rightTs)
    val rightTagged = right.select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      struct((col(rightTs).as(rightTs) +:
        rightPayloadCols.toSeq.map(col)): _*).as("_rpay"))
    val leftTagged = left.select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      lit(null).cast(rightTagged.schema("_rpay").dataType).as("_rpay"),
      struct(left.columns.toSeq.map(col): _*).as("_lpay"))
    val unioned = rightTagged
      .withColumn("_lpay", lit(null).cast(leftTagged.schema("_lpay").dataType))
      .unionByName(leftTagged)
    val w = Window.partitionBy($"_k").orderBy($"_ts".asc, $"_side".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_carried", last($"_rpay", ignoreNulls = true).over(w))
      .filter($"_side" === 1 &&
        (if (outer) lit(true) else $"_carried".isNotNull))
      .select(col("_lpay.*") +: Seq(col("_carried")): _*)
  }

  /** a01: for each event, the user's most recent order at event time.
    * Oracle = DuckDB's native ASOF JOIN over the same tables. */
  val a01EventOrderAsof: Q = Q(
    "a01_asof_join",
    """WITH r AS (
      |  SELECT o_custkey, o_orderdate,
      |    max(o_orderkey) AS last_orderkey, count(*) AS n_same_ts
      |  FROM orders GROUP BY o_custkey, o_orderdate),
      |l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'purchase')
      |SELECT l.event_id, l.user_id, l.ts,
      |  r.o_orderdate AS asof_orderdate, r.last_orderkey
      |FROM l ASOF JOIN r
      |  ON l.user_id = r.o_custkey AND l.ts >= r.o_orderdate""".stripMargin) {
    (s, d) =>
      import s.implicits._
      // right side made unique per (key, ts): latest orderkey wins
      val rightUnique = Tables.orders(s, d)
        .groupBy($"o_custkey", $"o_orderdate")
        .agg(max($"o_orderkey").as("last_orderkey"))
        .select($"o_custkey".as("user_id"), $"o_orderdate",
          $"last_orderkey")
      val left = Tables.events(s, d)
        .filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      asofJoin(left, rightUnique, key = "user_id", leftTs = "ts",
        rightTs = "o_orderdate")
        .select($"event_id", $"user_id", $"ts",
          $"_carried.o_orderdate".as("asof_orderdate"),
          $"_carried.last_orderkey".as("last_orderkey"))
  }

  /** a02: LEFT OUTER as-of join with a match TOLERANCE — the pandas
    * `merge_asof(tolerance=...)` contract: every left row survives, and
    * a carried match older than 30 days is nulled out (stale quotes
    * must not attribute). The tolerance is a post-carry null-out — the
    * shuffle/sort cost is identical to a01's inner form; only the final
    * projection changes. Oracle: DuckDB ASOF LEFT JOIN + the same
    * conditional null-out. */
  val a02AsofTolerance: Q = Q(
    "a02_asof_tolerance",
    """WITH r AS (
      |  SELECT o_custkey, o_orderdate,
      |    max(o_orderkey) AS last_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate),
      |l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |      FROM events WHERE event_type = 'purchase'),
      |a AS (SELECT l.event_id, l.user_id, l.ts,
      |        r.o_orderdate, r.last_orderkey
      |      FROM l ASOF LEFT JOIN r
      |        ON l.user_id = r.o_custkey AND l.ts >= r.o_orderdate)
      |SELECT event_id, user_id, ts,
      |  CASE WHEN ts <= o_orderdate + INTERVAL 30 DAY
      |       THEN o_orderdate END AS asof_orderdate,
      |  CASE WHEN ts <= o_orderdate + INTERVAL 30 DAY
      |       THEN last_orderkey END AS last_orderkey
      |FROM a""".stripMargin) { (s, d) =>
    import s.implicits._
    val rightUnique = Tables.orders(s, d)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("last_orderkey"))
      .select($"o_custkey".as("user_id"), $"o_orderdate", $"last_orderkey")
    val left = Tables.events(s, d)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val fresh = $"_carried".isNotNull &&
      $"ts" <= $"_carried.o_orderdate" + expr("INTERVAL 30 DAYS")
    asofJoin(left, rightUnique, key = "user_id", leftTs = "ts",
      rightTs = "o_orderdate", outer = true)
      .select($"event_id", $"user_id", $"ts",
        when(fresh, $"_carried.o_orderdate").as("asof_orderdate"),
        when(fresh, $"_carried.last_orderkey").as("last_orderkey"))
  }

  /** a03: time-INTERPOLATED join — the sensor-fusion upgrade of a01's
    * last-before semantics (pandas merge_asof answers "the last
    * reading"; a telemetry/feature pipeline usually wants "the value
    * AT this instant"): for each probe row, linearly interpolate the
    * measurement series between its bracketing readings,
    * v = v_prev + (v_next − v_prev)·(t − t_prev)/(t_next − t_prev),
    * carrying v_prev flat past the last reading (kind = 'carry') and
    * dropping probes before the first one.
    *
    * Both brackets come out of ONE shuffle: the union-carry sort of
    * a01 gives prev via last(ignoreNulls) over unbounded-preceding,
    * and next via first(ignoreNulls) over unbounded-following — the
    * two frames share the (user, ts, side) sort, so Spark plans one
    * exchange + one partition-local sort, a01's exact bill. At equal
    * timestamps the reading sorts before the probe (side order), so
    * an exact-hit probe interpolates with fraction 0 — bit-equal to
    * the reading itself.
    *
    * Oracle: the same construction in DuckDB window SQL (IGNORE
    * NULLS + named frames), epoch-microsecond arithmetic on both
    * sides — `/` on integers is double division in both engines, and
    * the fraction is PARENTHESIZED so both engines associate
    * pv + (nv − pv)·(dt/dT) identically (left-associative
    * ((nv−pv)·dt)/dT differs in the raw double on ~14% of fixture
    * rows; rounding would usually mask it, but the hash gate must not
    * depend on rounding luck). */
  val a03InterpolatedJoin: Q = Q(
    "a03_interpolated_join",
    """WITH m AS (SELECT user_id, ts, max(value) AS v
      |           FROM events WHERE event_type = 'view'
      |           GROUP BY user_id, ts),
      |q AS (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'click'),
      |u AS (SELECT user_id, ts, 0 AS side, ts AS mts, v,
      |        NULL::BIGINT AS event_id FROM m
      |      UNION ALL
      |      SELECT user_id, ts, 1 AS side, NULL, NULL, event_id FROM q),
      |c AS (SELECT *,
      |        last_value(mts IGNORE NULLS) OVER w_prev AS pts,
      |        last_value(v IGNORE NULLS) OVER w_prev AS pv,
      |        first_value(mts IGNORE NULLS) OVER w_next AS nts,
      |        first_value(v IGNORE NULLS) OVER w_next AS nv
      |      FROM u
      |      WINDOW
      |        w_prev AS (PARTITION BY user_id ORDER BY ts, side
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |        w_next AS (PARTITION BY user_id ORDER BY ts, side
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_id, user_id,
      |  round(CASE WHEN nts IS NULL OR nts = pts THEN pv
      |        ELSE pv + (nv - pv) * ((epoch_us(ts) - epoch_us(pts))
      |               / (epoch_us(nts) - epoch_us(pts))) END, 6) AS v_interp,
      |  CASE WHEN nts IS NULL THEN 'carry' ELSE 'interp' END AS kind
      |FROM c WHERE side = 1 AND pts IS NOT NULL""".stripMargin) { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d)
    val m = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"value").as("v"))
    val probes = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val u = m.select($"user_id", $"ts", lit(0).as("side"),
        $"ts".as("mts"), $"v", lit(null).cast("long").as("event_id"))
      .unionByName(probes.select($"user_id", $"ts", lit(1).as("side"),
        lit(null).cast("timestamp").as("mts"),
        lit(null).cast("double").as("v"), $"event_id"))
    val ord = Window.partitionBy($"user_id").orderBy($"ts".asc, $"side".asc)
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val frac = (unix_micros($"ts") - unix_micros($"pts")) /
      (unix_micros($"nts") - unix_micros($"pts"))
    u.withColumn("pts", last($"mts", ignoreNulls = true).over(wPrev))
      .withColumn("pv", last($"v", ignoreNulls = true).over(wPrev))
      .withColumn("nts", first($"mts", ignoreNulls = true).over(wNext))
      .withColumn("nv", first($"v", ignoreNulls = true).over(wNext))
      .filter($"side" === 1 && $"pts".isNotNull)
      .select($"event_id", $"user_id",
        round(when($"nts".isNull || $"nts" === $"pts", $"pv")
          .otherwise($"pv" + ($"nv" - $"pv") * frac), 6).as("v_interp"),
        when($"nts".isNull, lit("carry")).otherwise(lit("interp"))
          .as("kind"))
  }

  val all: Seq[Q] = Seq(a01EventOrderAsof, a02AsofTolerance,
    a03InterpolatedJoin)
}
