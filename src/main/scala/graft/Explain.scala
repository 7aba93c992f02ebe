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
    val spark = GraftSession.local("8", "graft-explain")
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
