package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog surface (SURVEY.md §1.1, §3.2): databases, managed tables,
  * inserts, column statistics (ANALYZE → CBO inputs), partitioned
  * tables with pruning, and views — the metastore capabilities the
  * reference exposes over Thrift, consumed here through Spark's catalog
  * API. This spec runs on the in-memory session catalog; the SAME
  * surface (plus ALTER PARTITION and cross-session persistence) runs
  * against a real Hive metastore (enableHiveSupport + embedded Derby)
  * in [[graft.HiveCatalogCheck]] — its own forked JVM, since Derby
  * locks exclusively and catalogImplementation is session-static:
  * `sbt "runMain graft.HiveCatalogCheck"`. */
class CatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ensureDb(): Unit =
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_cat")

  private def ensureOrdersT(): Unit = {
    ensureDb()
    if (!spark.catalog.tableExists("graft_cat.orders_t")) {
      sources.Tables.orders(spark, sf).write.saveAsTable("graft_cat.orders_t")
    }
  }

  test("database + managed table DDL + insert") {
    ensureDb()
    spark.sql("DROP TABLE IF EXISTS graft_cat.nation_t")
    sources.Tables.nation(spark, sf).write
      .saveAsTable("graft_cat.nation_t")
    assert(spark.catalog.tableExists("graft_cat.nation_t"))
    val before = spark.table("graft_cat.nation_t").count()
    spark.sql(
      "INSERT INTO graft_cat.nation_t VALUES (99, 'NATION_X', 0)")
    assert(spark.table("graft_cat.nation_t").count() == before + 1)
    assert(spark.catalog.listTables("graft_cat").collect()
      .exists(_.name == "nation_t"))
  }

  test("ANALYZE TABLE feeds CBO statistics") {
    ensureDb()
    spark.sql("DROP TABLE IF EXISTS graft_cat.orders_t")
    sources.Tables.orders(spark, sf).write.saveAsTable("graft_cat.orders_t")
    spark.sql("ANALYZE TABLE graft_cat.orders_t COMPUTE STATISTICS " +
      "FOR COLUMNS o_orderkey, o_totalprice")
    val stats = spark.table("graft_cat.orders_t")
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(1500)))
    val desc = spark.sql(
      "DESCRIBE EXTENDED graft_cat.orders_t o_totalprice").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("distinct_count").toLong > 0)
  }

  test("partitioned table: SHOW PARTITIONS + partition pruning") {
    ensureDb()
    spark.sql("DROP TABLE IF EXISTS graft_cat.orders_p")
    sources.Tables.orders(spark, sf).write
      .partitionBy("o_orderstatus")
      .saveAsTable("graft_cat.orders_p")
    val parts = spark.sql("SHOW PARTITIONS graft_cat.orders_p")
      .collect().map(_.getString(0)).toSet
    assert(parts == Set("o_orderstatus=F", "o_orderstatus=O",
      "o_orderstatus=P"))
    val pruned = spark.table("graft_cat.orders_p")
      .filter("o_orderstatus = 'F'")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("o_orderstatus"), s"no partition pruning:\n$scan")
  }

  test("CTAS, INSERT OVERWRITE, TRUNCATE") {
    ensureDb()
    SparkTestSession.register() // fixture temp views
    spark.sql("DROP TABLE IF EXISTS graft_cat.cust_ctas")
    spark.sql(
      """CREATE TABLE graft_cat.cust_ctas AS
        |SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
    val n1 = spark.table("graft_cat.cust_ctas").count()
    assert(n1 > 0)
    // INSERT OVERWRITE replaces, not appends
    spark.sql(
      """INSERT OVERWRITE TABLE graft_cat.cust_ctas
        |SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')""".stripMargin)
    val n2 = spark.table("graft_cat.cust_ctas").count()
    assert(n2 > n1, s"overwrite should widen: $n1 -> $n2")
    spark.sql(
      """INSERT OVERWRITE TABLE graft_cat.cust_ctas
        |SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
    assert(spark.table("graft_cat.cust_ctas").count() == n1)
    spark.sql("TRUNCATE TABLE graft_cat.cust_ctas")
    assert(spark.table("graft_cat.cust_ctas").count() == 0)
  }

  test("persistent view over catalog tables") {
    ensureOrdersT()
    spark.sql("DROP VIEW IF EXISTS graft_cat.big_orders_v")
    spark.sql(
      """CREATE VIEW graft_cat.big_orders_v AS
        |SELECT o_orderkey, o_totalprice FROM graft_cat.orders_t
        |WHERE o_totalprice > 300000""".stripMargin)
    val n = spark.table("graft_cat.big_orders_v").count()
    assert(n > 0 && n < 1500)
    assert(spark.catalog.getTable("graft_cat", "big_orders_v")
      .tableType == "VIEW")
  }
}
