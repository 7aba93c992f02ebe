package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL front end for the dedup family — the same closure the retrieval
  * TVFs gave s12/s13: the near-dup pipeline is the most operationally
  * used capability in a training-data deployment, and until these two
  * functions it was DSL-only. Registered like the other TVFs through
  * `SparkSessionExtensions.injectTableFunction` (no parser changes):
  *
  * {{{
  *   SELECT * FROM neardup_pairs('documents')
  *     -- (doc_a, doc_b, inter, uni, jaccard): MinHash-LSH candidates,
  *     -- exact-Jaccard verified at J >= 0.5 (d03's plan verbatim)
  *   SELECT * FROM dedup_clusters('documents')
  *     -- (doc_id, cluster_id): connected components over those pairs
  *     -- by large/small-star contraction (d06b's plan verbatim)
  * }}}
  *
  * Relation arguments name registered temp/permanent/filtered views
  * (columns `doc_id`, `text`). The builders return the DSL's logical
  * plans verbatim ([[graft.operators.Dedup.minhashPairsOf]] /
  * [[graft.operators.Dedup.connectedComponentsStars]] — the exact
  * implementations d03's/d06b's DuckDB oracles hash-verify), so the
  * SQL surface cannot drift from the audited plans; SqlParitySpec pins
  * TVF-over-the-fixture-view equal to the registered queries. Both
  * take only the relation argument — the 64-hash/16-band family is the
  * d03-calibrated default a SQL user should not have to re-derive
  * (recall floors for exactly this configuration are what SCALE_r*
  * measures). */
object NeardupPairsTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("neardup_pairs")

  val info: ExpressionInfo = new ExpressionInfo(
    NeardupPairsTvf.getClass.getName, "neardup_pairs")

  def build(args: Seq[Expression]): LogicalPlan = {
    val (names, k) = RetrievalTvfs.parse("neardup_pairs", args, nTables = 1)
    require(k.isEmpty, "usage: neardup_pairs(<docs view>) — the " +
      "64-hash/16-band family is fixed (the d03-calibrated default)")
    graft.operators.Dedup
      .minhashPairsOf(SparkSession.active.table(names.head),
        numHashes = 64, bands = 16)
      .queryExecution.logical
  }
}

/** Plan-build memo for [[DedupClustersTvf]] — the [[TvfViewCounts]]
  * move applied to a whole ITERATIVE build: the star contraction runs
  * driver-rounds of distributed jobs at plan build, so before this
  * memo every fresh `spark.sql` of the same text (and every EXPLAIN)
  * re-ran the full clustering. One [[LatestEntryMemo]] instance (see
  * its scaladoc for the latest-entry / lock-free-hit semantics): a
  * re-registered view DEFINITION re-clusters AND releases the
  * superseded plan (letting the ContextCleaner reclaim its
  * localCheckpointed blocks once unreferenced), while repeat
  * invocations splice the cached result plan (whose checkpointed
  * rounds stay alive in the session's block manager). Staleness is
  * the shared memo contract (round 17): the key mixes in the file
  * LISTING of every file-backed leaf, so appended/overwritten files
  * re-cluster once the catalog serves the new listing; the residual
  * windows (a temp view's frozen listing, an in-place same-name
  * rewrite) are closed by re-registering the view or
  * `graft_refresh('<view>')`. */
private[graft] object TvfClusterPlans extends LatestEntryMemo[LogicalPlan] {
  def planOf(name: String, df: org.apache.spark.sql.DataFrame)(
      build: => LogicalPlan): LogicalPlan = getOrBuild(name, df)(build)
}

/** `dedup_clusters(<docs view>)` — d06b's duplicate clusters: the
  * [[NeardupPairsTvf]] pair stage contracted to connected components
  * (large/small-star, O(log² n) rounds at any component diameter).
  * Returns (doc_id, cluster_id); cluster_id = min doc_id of the
  * component; singleton docs are absent (same contract as d06b).
  *
  * Cost caveat: the star contraction ITERATES AT PLAN BUILD (driver-
  * rounds of distributed jobs — the hybrid_topk count-job precedent
  * taken further), so the FIRST `spark.sql` (or EXPLAIN) of a given
  * view pays the full clustering; repeat invocations reuse the
  * memoized result plan ([[TvfClusterPlans]], round-16) until the
  * view's definition OR file listing changes, or
  * `graft_refresh('<view>')` evicts it (round 17). A pipeline that
  * reuses cluster assignments across sessions should still
  * materialize the DSL's output
  * (d06b / [[graft.operators.Dedup.connectedComponentsStars]]). */
object DedupClustersTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("dedup_clusters")

  val info: ExpressionInfo = new ExpressionInfo(
    DedupClustersTvf.getClass.getName, "dedup_clusters")

  def build(args: Seq[Expression]): LogicalPlan = {
    val (names, k) = RetrievalTvfs.parse("dedup_clusters", args, nTables = 1)
    require(k.isEmpty, "usage: dedup_clusters(<docs view>)")
    val s = SparkSession.active
    import org.apache.spark.sql.functions.col
    val dedup = graft.operators.Dedup
    val docs = s.table(names.head)
    TvfClusterPlans.planOf(names.head, docs) {
      dedup.connectedComponentsStars(
          dedup.minhashPairsOf(docs, numHashes = 64, bands = 16)
            .select(col("doc_a"), col("doc_b")))
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
        .queryExecution.logical
    }
  }
}
