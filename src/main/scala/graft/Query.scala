package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark-first builder plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle query over the
  * same parquet tables. `oracle == None` downgrades the driver's check
  * to rows-only (SURVEY.md §5.2).
  *
  * Column-name contract: the driver's comparator sorts columns by name
  * before hashing, so every computed column is aliased identically in
  * the Spark builder and the oracle SQL.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, Some(oracle))

  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, None)
}
