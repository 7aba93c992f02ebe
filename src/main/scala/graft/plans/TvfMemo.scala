package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE latest-entry-per-(session, view) memo both TVF plan-build
  * caches instantiate ([[TvfViewCounts]] for quantizer-sizing counts,
  * [[TvfClusterPlans]] for dedup_clusters' contracted plans) — the
  * round-16 self-review found the two had converged to structurally
  * identical copies in two files, so any future fix would have to
  * land twice and could drift.
  *
  * Semantics: keyed by (session, view name), holding ONLY the latest
  * definition's (analyzed-plan semanticHash, value). A re-registered
  * definition rebuilds AND releases the superseded value (so a
  * clustering's localCheckpointed blocks become collectable);
  * re-registering the identical definition keeps the cached value.
  * Staleness caveat (documented at both call sites): files changing
  * UNDER an unchanged view definition are not detected.
  *
  * Concurrency: cache HITS are lock-free (a plain get + hash compare
  * — the self-review's second finding: running a Spark job inside
  * ConcurrentHashMap.compute holds the bin lock, so a shared
  * session's hit-path calls would block behind another thread's
  * build). Only a miss/definition-change falls into compute(), where
  * holding the per-key lock during the build is DESIRED — two threads
  * racing the same fresh view run one count/clustering, not two. */
private[graft] class LatestEntryMemo[V] {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      (Int, V)]()
  // test instrumentation: PlanSpec/SqlParitySpec assert one build job
  // across repeat invocations by watching misses
  @volatile private[graft] var misses = 0L

  def getOrBuild(name: String, df: DataFrame)(build: => V): V = {
    val h = df.queryExecution.analyzed.semanticHash()
    val key = (df.sparkSession, name)
    val hit = cache.get(key)
    if (hit != null && hit._1 == h) hit._2
    else cache.compute(key, (_, old) =>
      if (old != null && old._1 == h) old
      else { misses += 1; (h, build) })._2
  }
}
