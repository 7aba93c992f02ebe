package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration pack for graft's SQL-visible gap functions
  * (SURVEY.md §7.1 step 3 — the reference functions absent from the
  * Spark 4.1.2 registry, Appendix A "GAP" rows). Populated as the
  * expressions land; `GraftSession.local` calls this on every session.
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    HiveCompat.registerAll(spark)
  }
}
