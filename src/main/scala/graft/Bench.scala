package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: results are materialized through the `noop` sink —
  * `.count()` would let Catalyst prune computed columns and undercount
  * the real work. A warmup query amortizes JVM/codegen startup out of
  * the first measurement.
  *
  * Regression tracking: per-query wall-clock is diffed against the t0
  * table in BASELINE.md (`| query | seconds |` rows); queries slower
  * than 1.5x their t0 are listed under "regressions" in the JSON line
  * so a round-over-round slowdown is visible in the bench output
  * itself, not only to a human diffing files. */
object Bench {

  /** Parse `| query | seconds |` rows out of BASELINE.md. Rounds append
    * their tables, and duplicate keys keep the LAST occurrence, so the
    * anchor is always the most recent round's numbers — regressions are
    * flagged round-over-round, not only vs the original t0. */
  private def baselineT0(): Map[String, Double] = {
    val f = new java.io.File("BASELINE.md")
    if (!f.exists()) return Map.empty
    val row = """\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|""".r
    scala.io.Source.fromFile(f)(scala.io.Codec.UTF8).getLines()
      .collect { case row(name, secs) => name -> secs.toDouble }
      .toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.registerAll(spark)

    val t0 = baselineT0()

    def run(name: String): Double = {
      val start = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val dt = (System.nanoTime() - start) / 1e9
      val ratio = t0.get(name).map(b => f" (${dt / b}%4.2fx t0)").getOrElse("")
      System.err.println(f"[bench] $name%-28s $dt%8.2fs$ratio")
      dt
    }

    // warmup: touch every fixture table + one agg to JIT the scan path
    run("q01_pricing_summary")

    // optional args: restrict to the named queries (bench iteration aid)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.contains(n))
    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val ratios = results.collect {
      case (k, v) if v >= 0 && t0.contains(k) =>
        "\"" + k + "\":" + f"${v / t0(k)}%.3f"
    }.mkString("{", ",", "}")
    val regressions = results.collect {
      case (k, v) if v >= 0 && t0.contains(k) && v / t0(k) > 1.5 => k
    }.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ratios_vs_t0":$ratios,"regressions":$regressions,"sf":"$sfDir"}""")
    spark.stop()
  }
}
