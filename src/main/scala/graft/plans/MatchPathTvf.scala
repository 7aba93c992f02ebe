package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL front-end for the row-pattern matcher: a table-valued function
  *
  * {{{
  *   SELECT * FROM matchpath('events', 'view', 'click*', 'purchase')
  *   SELECT * FROM matchpath('events', 'bigv', 'click*', 'purchase',
  *                           'bigv := event_type = ''view'' AND value >= 30')
  * }}}
  *
  * — first argument names a table/view, the rest are the pattern
  * tokens of [[graft.operators.Windows.matchPathQuant]] (`sym`,
  * `sym*` or `sym+`; the pattern may end in a quantified run, e.g.
  * `matchpath('events', 'view', 'click+')`), optionally followed by
  * `'name := <boolean sql>'` symbol definitions (the reference PTF's
  * symbol-expression argument pairs); undefined symbols default to
  * `event_type = name`. This is the reference PTF's own
  * calling convention surface (SURVEY.md §2.4 matchpath is a table
  * function in the reference too); the compiled plan is IDENTICAL to
  * the DSL's — the TVF builder just returns matchPathQuant's logical
  * plan, so the one-exchange/one-sort shape carries over unchanged.
  *
  * COMPOSITION over arbitrary relations: the table argument resolves
  * through the active session's catalog, so matchpath runs over ANY
  * DataFrame — register it first (`df.createOrReplaceTempView("v")`,
  * or a permanent/filtered SQL view) and name the view. This is the
  * engine's composition path for the reference PTF's
  * subquery-argument form (`matchpath(SELECT ... , pattern)`): SQL
  * views and temp views are the relation arguments; SqlParitySpec
  * pins matchpath-over-a-filtered-view equal to the DSL over the same
  * filtered frame.
  *
  * Registered through `SparkSessionExtensions.injectTableFunction`
  * (see [[GraftExtensions]]), Spark's public hook for catalog table
  * functions — no parser changes needed. */
object MatchPathTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("matchpath")

  val info: ExpressionInfo = new ExpressionInfo(
    MatchPathTvf.getClass.getName, "matchpath")

  /** args => logical plan. All arguments must be string literals: the
    * table name, then >= 1 pattern tokens, then optional symbol
    * definitions (`name := <sql>`). */
  def build(args: Seq[Expression]): LogicalPlan = {
    val strs = args.map {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"matchpath arguments must be string literals, got: $other")
    }
    require(strs.size >= 2,
      "usage: matchpath(<table or view>, <sym | sym* | sym+> ..., " +
        "['name := <predicate sql>' ...])")
    val (defs, tokens) = strs.tail.partition(_.contains(":="))
    require(tokens.nonEmpty,
      "matchpath: pattern tokens missing (only symbol definitions given)")
    // a malformed definition ('=' for ':=') would otherwise classify
    // as a pattern token that can never match → silent empty result
    val tokenShape = "[A-Za-z_][A-Za-z0-9_]*[*+]?".r
    tokens.foreach { t =>
      require(tokenShape.matches(t),
        s"matchpath: '$t' is not a pattern token (sym, sym* or sym+)" +
          " — a symbol definition must use ':='")
    }
    val symbols = defs.map { s =>
      val Array(name, pred) = s.split(":=", 2)
      // an empty name (' := pred') would otherwise surface later as a
      // misleading "not used by any pattern token" error
      require(name.trim.nonEmpty,
        s"matchpath: malformed symbol definition '$s' — empty name" +
          " before ':='")
      // expr() parses through the active session's own SQL parser, so
      // definition predicates speak exactly the engine's dialect
      name.trim -> org.apache.spark.sql.functions.expr(pred.trim)
    }.toMap
    val events = SparkSession.active.table(strs.head)
    graft.operators.Windows.matchPathQuant(events, tokens, symbols)
      .queryExecution.logical
  }
}
