package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `table_fsck(<chain dir>)` — dq08's manifest-consistency audit
  * pointed at ANY SCD2 chain directory from a SQL prompt: one row per
  * check (check_name, n_violations), all zeros on a healthy chain.
  * The operational surface the audit family was missing: dq08/st25
  * run the audit inside fixture-bound builders (they construct their
  * own corrupted chains so the driver oracle sees real violations),
  * while an operator mid-incident wants `SELECT * FROM
  * table_fsck('/warehouse/dim_customer')` against the table that just
  * paged them. Returns
  * [[graft.operators.Audit.manifestAuditChecks]]'s plan verbatim —
  * the exact arithmetic dq08's DuckDB oracle hash-verifies —
  * so the SQL surface cannot drift from the audited checks;
  * SqlParitySpec pins clean-chain zeros AND a corruption flip through
  * a real chain build. */
object TableFsckTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("table_fsck")

  val info: ExpressionInfo = new ExpressionInfo(
    TableFsckTvf.getClass.getName, "table_fsck")

  def build(args: Seq[Expression]): LogicalPlan = {
    val (names, k) = RetrievalTvfs.parse("table_fsck", args, nTables = 1)
    require(k.isEmpty, "usage: table_fsck(<scd2 chain dir>)")
    graft.operators.Audit
      .manifestAuditChecks(SparkSession.active, names.head)
      .queryExecution.logical
  }
}
