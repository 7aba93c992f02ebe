package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler._

/** Dev tool (optimization rounds): run named queries through the noop
  * sink under a SparkListener and print a per-query breakdown —
  * wall-clock, number of Spark jobs/stages/tasks, summed task time,
  * shuffle read/write bytes, input bytes, GC time. The jobs count and
  * the task-time/wall ratio separate "driver-sequential multi-job
  * structure" from "one big parallel job" — the first thing the
  * optimization guide (§1) asks before touching an operator.
  *
  *   sbt "runMain graft.Profile d13_prefix_jaccard s09_diverse_knn"
  *
  * Each query runs twice; the SECOND (warm) run is reported. Reads
  * SPARK_GRAFT_SF_DIR (default sf0.1) like Bench. Not part of the
  * driver contract; BENCH numbers stay Bench.scala's job. */
object Profile {

  private class Agg extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufReadB = new AtomicLong
    val shufWriteB = new AtomicLong
    val inputB = new AtomicLong
    val outputRows = new AtomicLong
    // per-stage attribution (—stages mode): stageId -> (name, tasks,
    // taskMs, inputB, shufReadB, wallMs)
    case class St(name: String, var tasks: Int = 0, var taskMs: Long = 0,
      var inB: Long = 0, var srB: Long = 0, var wallMs: Long = 0)
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, St]
    // per-job wall: jobId -> (callSite, startMs, endMs, nStages)
    case class Jb(site: String, start: Long, var end: Long = 0,
      var nStages: Int = 0)
    val byJob = new java.util.concurrent.ConcurrentHashMap[Int, Jb]
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      val site = Option(j.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      byJob.put(j.jobId, Jb(site, j.time, nStages = j.stageInfos.size))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      val jb = byJob.get(j.jobId)
      if (jb != null) jb.end = j.time
    }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val i = sc.stageInfo
      val st = byStage.computeIfAbsent(i.stageId, _ => St(i.name))
      st.wallMs = (for {a <- i.completionTime; b <- i.submissionTime}
        yield a - b).getOrElse(0L)
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        inputB.addAndGet(m.inputMetrics.bytesRead)
        val st = byStage.computeIfAbsent(t.stageId, _ => St("?"))
        st.synchronized {
          st.tasks += 1; st.taskMs += m.executorRunTime
          st.inB += m.inputMetrics.bytesRead
          st.srB += m.shuffleReadMetrics.totalBytesRead
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]").appName("graft-profile"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.registerAll(spark)

    val detail = args.contains("--stages")
    val names =
      if (args.exists(!_.startsWith("--"))) args.toSeq.filterNot(_.startsWith("--"))
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown: ${unknown.mkString(", ")}")

    println(f"${"query"}%-34s ${"wall_s"}%7s ${"jobs"}%5s ${"stg"}%5s " +
      f"${"tasks"}%6s ${"task_s"}%8s ${"gc_s"}%6s ${"shR_MB"}%8s " +
      f"${"shW_MB"}%8s ${"in_MB"}%8s")
    names.foreach { n =>
      def once(report: Boolean): Unit = {
        val agg = new Agg
        spark.sparkContext.addSparkListener(agg)
        spark.sparkContext.setJobDescription(s"profile:$n")
        val t0 = System.nanoTime()
        try SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[profile] $n failed: ${e.getMessage}")
        }
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async — give it a moment to drain before
        // reading counters (waitUntilEmpty is private[spark])
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(agg)
        if (report) {
          println(f"$n%-34s $wall%7.2f ${agg.jobs.get}%5d " +
            f"${agg.stages.get}%5d ${agg.tasks.get}%6d " +
            f"${agg.taskTimeMs.get / 1e3}%8.1f ${agg.gcMs.get / 1e3}%6.1f " +
            f"${agg.shufReadB.get / 1e6}%8.1f " +
            f"${agg.shufWriteB.get / 1e6}%8.1f ${agg.inputB.get / 1e6}%8.1f")
          if (detail) {
            import scala.jdk.CollectionConverters._
            println("  -- top stages by task time --")
            agg.byStage.asScala.toSeq.sortBy(-_._2.taskMs).take(12)
              .foreach { case (id, st) =>
                println(f"  stage $id%4d ${st.tasks}%5d tasks " +
                  f"${st.taskMs / 1e3}%7.2f task_s ${st.wallMs / 1e3}%6.2f " +
                  f"wall_s in=${st.inB / 1e6}%6.1fMB sr=${st.srB / 1e6}%6.1fMB " +
                  f" ${st.name.take(90)}")
              }
            println("  -- top jobs by wall --")
            agg.byJob.asScala.toSeq
              .sortBy { case (_, j) => -(j.end - j.start) }.take(12)
              .foreach { case (id, j) =>
                println(f"  job $id%4d ${(j.end - j.start) / 1e3}%7.2f s " +
                  f"${j.nStages}%3d stages  ${j.site.take(80)}")
              }
          }
        }
      }
      once(report = false) // warm: JIT, fs cache, fixture scratch dirs
      once(report = true)
    }
    spark.stop()
  }
}
