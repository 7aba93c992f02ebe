package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.catalog.{CatalogTable, HiveTableRelation}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.internal.SQLConf

/** Answer bare `count(*)` / `count(col)` aggregates over an unfiltered
  * catalog table from ANALYZE statistics instead of scanning — the
  * reference's StatsOptimizer / `hive.compute.query.using.stats`
  * surface (SURVEY.md §4.1), re-expressed as a Catalyst
  * `Rule[LogicalPlan]` injected through `SparkSessionExtensions`
  * ([[GraftExtensions]]).
  *
  * Soundness: Spark CLEARS catalog table statistics on every write to
  * the table (`CommandUtils.updateTableStats` — with size auto-update
  * it re-derives size but drops rowCount), so a PRESENT rowCount
  * implies no write has happened since the last ANALYZE; answering
  * from it cannot return stale counts. `count(col)` additionally needs
  * that column's ANALYZE ... FOR COLUMNS nullCount. The rewrite is
  * still opt-in (`spark.graft.answerFromStats=true`, default false),
  * mirroring the reference's config gate.
  *
  * At 100 TB this turns a full-table scan into a metastore lookup —
  * the highest single-query speedup in the engine, and the reason the
  * reference ships the same rule.
  */
case class StatsAnsweredAggregates(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.answerFromStats", "false") == "true"

  /** The catalog table beneath an Aggregate child that is a bare
    * relation (possibly under a column-pruning Project of plain
    * attributes — no Filter anywhere). */
  private def bareTable(plan: LogicalPlan): Option[CatalogTable] =
    plan match {
      case r: HiveTableRelation => Some(r.tableMeta)
      case r: LogicalRelation => r.catalogTable
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        bareTable(child)
      case _ => None
    }

  /** Evaluate one aggregate output column from stats, if possible. */
  private def fromStats(e: NamedExpression, t: CatalogTable,
      rowCount: BigInt): Option[Long] = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(_, _))), Complete,
        false, _, _), _) =>
      Some(rowCount.toLong) // count(*) / count(1)
    case Alias(AggregateExpression(Count(Seq(a: Attribute)), Complete,
        false, _, _), _) =>
      t.stats.flatMap(_.colStats.get(a.name)).flatMap(_.nullCount)
        .map(n => (rowCount - n).toLong)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case a @ Aggregate(Nil, aggExprs, child, _) =>
        (for {
          table <- bareTable(child)
          rowCount <- table.stats.flatMap(_.rowCount)
          values <- {
            val vs = aggExprs.map(fromStats(_, table, rowCount))
            if (vs.forall(_.isDefined)) Some(vs.map(_.get)) else None
          }
        } yield LocalRelation(
          a.output,
          Seq(InternalRow.fromSeq(values)))).getOrElse(a)
    }
}
