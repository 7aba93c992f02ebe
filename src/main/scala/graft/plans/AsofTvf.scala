package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL front-end for the as-of join: a table-valued function
  *
  * {{{
  *   SELECT l.*, _carried.o_orderdate
  *   FROM asof_join('purchases', 'orders_by_day',
  *                  'user_id', 'ts', 'o_orderdate') AS l
  *   SELECT * FROM asof_join('trades', 'quotes',
  *                           'sym', 'ts', 'ts', 'outer')
  * }}}
  *
  * — arguments name the left and right relations (any registered
  * temp/permanent/filtered view: the same composition path as the
  * matchpath TVF), the join key, and the two timestamp columns; an
  * optional final `'outer'` keeps unmatched left rows (the a02
  * contract's base). Output is every left column plus the `_carried`
  * struct holding the matched right row's timestamp and payload —
  * select through it (`_carried.<col>`) exactly as the DSL call sites
  * do.
  *
  * The builder returns [[graft.operators.AsofJoin.asofJoin]]'s logical
  * plan verbatim, so the one-shuffle union-carry shape (and DuckDB
  * ASOF's inclusive `>=` tie semantics) carry over unchanged. SQL
  * engines that grew a native ASOF JOIN (DuckDB's is the a01/a02
  * oracle) expose it as syntax; Spark's parser has no such form, so
  * the engine exposes it as a catalog table function via
  * `SparkSessionExtensions.injectTableFunction` — no parser changes.
  *
  * The right relation must be unique per (key, ts) — pre-aggregate
  * in the view if not (the asofJoin contract). */
object AsofTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("asof_join")

  val info: ExpressionInfo = new ExpressionInfo(
    AsofTvf.getClass.getName, "asof_join")

  def build(args: Seq[Expression]): LogicalPlan = {
    val strs = args.map {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"asof_join arguments must be string literals, got: $other")
    }
    require(strs.size == 5 || strs.size == 6,
      "usage: asof_join(<left>, <right>, <key>, <left_ts>, <right_ts>" +
        " [, 'outer'])")
    val outer = strs.size == 6
    if (outer) require(strs(5) == "outer",
      s"asof_join: unknown option '${strs(5)}' — the only option is" +
        " 'outer'")
    val s = SparkSession.active
    graft.operators.AsofJoin.asofJoin(
        s.table(strs(0)), s.table(strs(1)),
        key = strs(2), leftTs = strs(3), rightTs = strs(4), outer = outer)
      .queryExecution.logical
  }
}
