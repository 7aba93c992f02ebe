package graft.functions

import org.apache.spark.sql.SparkSession

/** Hive-compatibility scalar functions that are pure rewrites over Spark
  * builtins — registered as SQL macros so both SQL text and the Column
  * DSL can use them. Heavier gap functions (custom Expressions,
  * Aggregators) live in their own files. Placeholder: populated in the
  * function-surface milestone.
  */
object HiveCompat {
  def registerAll(spark: SparkSession): Unit = ()
}
