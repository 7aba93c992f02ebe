package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of registered queries.
  *
  *   sbt "runMain graft.Explain q05_local_supplier_volume d04_ngram_jaccard"
  *
  * No args → every registered query. Plans are the per-operator review
  * surface the build plan mandates (explain-and-iterate, SURVEY.md §5.2). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    // --executed: materialize through the noop sink first and print the
    // FINAL adaptive plan — `.explain` alone shows the static plan, so
    // AQE's runtime decisions (broadcast↔SMJ flips, skew splits,
    // coalesced reads) are invisible without it. This is how the
    // at-scale plan claims in PLANS.md are checked against tmp/sf1.
    val executed = args.contains("--executed")
    val qnames = args.filterNot(_ == "--executed").toSeq
    val spark = GraftSession.local("8", "graft-explain")
    val names = if (qnames.nonEmpty) qnames
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (executed) {
        // execute df's OWN QueryExecution: a write/count/foreach wraps
        // the logical plan in a NEW QueryExecution (the SkewSpec trap)
        // and this df's AdaptiveSparkPlan would print
        // isFinalPlan=false with the pre-AQE choices; toRdd is the
        // one RDD backed by THIS QueryExecution's adaptive plan
        df.queryExecution.toRdd.foreach(_ => ())
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
