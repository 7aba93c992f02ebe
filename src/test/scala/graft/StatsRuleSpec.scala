package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.plans.StatsAnsweredAggregates — the reference's
  * `hive.compute.query.using.stats` parity rule, injected via
  * SparkSessionExtensions (GraftSession pins spark.sql.extensions). */
class StatsRuleSpec extends AnyFunSuite {
  import SparkTestSession._

  private val flag = "spark.graft.answerFromStats"

  private def withFlag[T](on: Boolean)(body: => T): T = {
    spark.conf.set(flag, on.toString)
    try body finally spark.conf.unset(flag)
  }

  private def setup(): Long = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_stats")
    spark.sql("DROP TABLE IF EXISTS graft_stats.nation_s")
    sources.Tables.nation(spark, sf).write
      .saveAsTable("graft_stats.nation_s")
    spark.sql("ANALYZE TABLE graft_stats.nation_s COMPUTE STATISTICS " +
      "FOR COLUMNS n_name")
    spark.table("graft_stats.nation_s").count()
  }

  test("count(*) over an analyzed table is answered from stats") {
    val n = setup()
    withFlag(true) {
      val q = spark.sql("SELECT count(*) AS n FROM graft_stats.nation_s")
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("LocalRelation"),
        s"expected stats-answered LocalRelation:\n$optimized")
      assert(!optimized.contains("Relation") ||
        !optimized.toLowerCase.contains("parquet"),
        s"table still scanned:\n$optimized")
      assert(q.collect()(0).getLong(0) == n)
    }
  }

  test("count(col) uses nullCount; flag off falls back to a scan") {
    val n = setup()
    withFlag(true) {
      val q = spark.sql(
        "SELECT count(n_name) AS n, count(1) AS total " +
          "FROM graft_stats.nation_s")
      assert(q.queryExecution.optimizedPlan.toString
        .contains("LocalRelation"))
      val r = q.collect()(0)
      assert(r.getLong(0) == n && r.getLong(1) == n)
    }
    withFlag(false) {
      val q = spark.sql("SELECT count(*) AS n FROM graft_stats.nation_s")
      assert(!q.queryExecution.optimizedPlan.toString
        .contains("LocalRelation"))
      assert(q.collect()(0).getLong(0) == n)
    }
  }

  test("filtered/grouped queries are never answered from stats") {
    setup()
    withFlag(true) {
      val filtered = spark.sql(
        "SELECT count(*) AS n FROM graft_stats.nation_s WHERE n_nationkey > 10")
      assert(!filtered.queryExecution.optimizedPlan.toString
        .contains("LocalRelation"))
      val grouped = spark.sql(
        "SELECT n_regionkey, count(*) AS n FROM graft_stats.nation_s " +
          "GROUP BY n_regionkey")
      assert(!grouped.queryExecution.optimizedPlan.toString
        .contains("LocalRelation"))
    }
  }

  test("writes clear stats, so stale answers are impossible") {
    val n = setup()
    withFlag(true) {
      spark.sql("INSERT INTO graft_stats.nation_s VALUES (98, 'X', 0)")
      val q = spark.sql("SELECT count(*) AS n FROM graft_stats.nation_s")
      // Spark drops rowCount stats on write -> rule must NOT fire, and
      // the scan must see the new row.
      assert(!q.queryExecution.optimizedPlan.toString
        .contains("LocalRelation"),
        "rule fired on a table written after ANALYZE")
      assert(q.collect()(0).getLong(0) == n + 1)
    }
  }
}
