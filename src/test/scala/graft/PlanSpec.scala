package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions (SURVEY.md §5.2 "plan tests" — the
  * replacement for the reference's EXPLAIN golden files): pushdown,
  * broadcast selection, top-k heap, partial aggregation, and the
  * shuffle-free bucketed SMB join. */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: filters reach the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("o_orderstatus") && p.contains("o_totalprice"))
    // pruned read schema: only the three projected columns
    assert(!p.contains("o_orderpriority"))
  }

  test("q03: orderBy+limit plans as TakeOrderedAndProject (bounded heap)") {
    assert(plan("q03_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q13: per-key rank filter plans a WindowGroupLimit bounded heap") {
    // The reference's ReduceSink keeps a bounded topN heap PER reducer
    // key group (SURVEY.md §2.5). Spark 3.5+ expresses the same thing
    // without a custom operator: a rank/row_number <= k filter inserts
    // WindowGroupLimit (partial before the shuffle, final after), so
    // only k rows per key survive into the window sort. This test pins
    // that the optimization actually fires — writing a custom
    // SparkStrategy here would duplicate a built-in.
    val p = plan("q13_window_rank")
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
    assert(p.contains("Partial") || p.contains("Final"),
      s"expected partial+final group limit:\n$p")
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"))
    assert(p.contains("HashAggregate"))
  }

  test("q05: dimension joins broadcast, no cartesian product") {
    val p = plan("q05_local_supplier_volume")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q28: IN-subquery plans as broadcast semi join") {
    val p = plan("q28_in_subquery")
    assert(p.contains("LeftSemi"))
    assert(p.contains("Broadcast"))
  }

  test("bucketed SMB join has no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    // a previously-aborted run can leave an orphaned location behind
    // that DROP TABLE (on a fresh metastore) doesn't know about
    Seq("orders_b", "lineitem_b").foreach { t =>
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val joined = sources.Writers.smbJoin(spark, sf)
    assert(joined.collect().nonEmpty)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    // bucketing co-partitions both sides: the whole plan is exchange-free
    assert(!p.contains("Exchange"), s"unexpected shuffle in SMB join:\n$p")
  }

  test("compaction rewrites many small files into the target count") {
    val src = java.nio.file.Files.createTempDirectory("graft_small").toString
    val dest = java.nio.file.Files.createTempDirectory("graft_compact").toString
    sources.Tables.orders(spark, sf).repartition(20).write
      .mode("overwrite").parquet(src)
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts(src) == 20)
    sources.Writers.compact(spark, src, dest, targetFiles = 2)
    assert(parts(dest) == 2)
    assert(spark.read.parquet(dest).count() ==
      sources.Tables.orders(spark, sf).count())
  }

  test("partitioned write produces partition directories") {
    val dest = java.nio.file.Files.createTempDirectory("graft_part").toString
    sources.Writers.writePartitioned(
      sources.Tables.orders(spark, sf), "o_orderstatus", dest)
    val dirs = new java.io.File(dest).listFiles().map(_.getName)
      .filter(_.startsWith("o_orderstatus="))
    assert(dirs.toSet == Set("o_orderstatus=F", "o_orderstatus=O",
      "o_orderstatus=P"))
    val back = spark.read.parquet(dest)
    assert(back.count() == sources.Tables.orders(spark, sf).count())
  }
}
