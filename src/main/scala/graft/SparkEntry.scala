package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented capability registers here as a [[Q]]: a Spark-first
  * DataFrame builder plus (when ANSI-SQL-expressible) a DuckDB oracle.
  */
object SparkEntry {

  /** All capability registries, concatenated. Order is presentation-only. */
  private def specs: Seq[Q] =
    operators.Relational.all ++ operators.Windows.all ++
      operators.Grouping.all ++ operators.SetOps.all ++
      operators.Subqueries.all ++ operators.Generators.all ++
      operators.Analytics.all ++ operators.Functions.all ++
      operators.Dedup.all ++ operators.TextAnalysis.all ++
      operators.Similarity.all ++ operators.Multimodal.all ++
      operators.StreamingQueries.all ++ operators.Formats.all ++
      operators.AsofJoin.all ++ operators.Script.all ++
      operators.Misc.all ++ operators.Pipeline.all ++
      operators.TpchJoins.all ++ operators.TpchFull.all ++
      operators.WriterQueries.all ++
      operators.RangeJoin.all ++ operators.ExportQueries.all ++
      operators.Splits.all ++ operators.Audit.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    functions.GraftFunctions.registerAll(spark)
    operators.Relational.q01PricingSummary.build(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
