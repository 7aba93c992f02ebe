package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL front end for the retrieval family (round-14 verdict ask #5:
  * the engine's stance is "library + thin SQL front", and matchpath /
  * as-of earned TVFs, but BM25 / hybrid retrieval were DSL-only — a
  * user at a SQL prompt could not reach them). Two table-valued
  * functions, registered like [[MatchPathTvf]] through
  * `SparkSessionExtensions.injectTableFunction` (no parser changes):
  *
  * {{{
  *   SELECT * FROM bm25_topk('documents')          -- (q_id, doc_id, rk)
  *   SELECT * FROM bm25_topk('documents', 3)       -- top-3 per query
  *   SELECT * FROM hybrid_topk('documents', 'embeddings')
  *                                                 -- (q_id, id, rrf, rk)
  * }}}
  *
  * Relation arguments name registered temp/permanent/filtered views —
  * the same composition path as the other TVFs. The builders return
  * the DSL's logical plans verbatim ([[graft.operators.Similarity
  * .bm25FromIndex]] / [[graft.operators.Similarity.bm25Hybrid]] — the
  * exact implementations s12/s13's DuckDB oracles hash-verify), so
  * the SQL surface cannot drift from the audited plans; SqlParitySpec
  * pins TVF-over-the-fixture-views equal to the registered queries.
  *
  * Shared argument grammar: leading string literals name relations,
  * one optional trailing integer literal overrides the top-k. */
private[plans] object RetrievalTvfs {

  def parse(fn: String, args: Seq[Expression], nTables: Int)
      : (Seq[String], Option[Int]) = {
    val (tables, rest) = args.splitAt(nTables)
    val names = tables.map {
      case Literal(v, StringType) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"$fn: the first $nTables argument(s) must be string literals" +
          s" naming tables/views, got: $other")
    }
    require(names.size == nTables && rest.size <= 1,
      s"usage: $fn(<${Seq.tabulate(nTables)(i => s"view$i").mkString(">, <")}>" +
        " [, <k>])")
    val k = rest.headOption.map {
      case Literal(v: Int, IntegerType) if v > 0 => v
      case other => throw new IllegalArgumentException(
        s"$fn: k must be a positive integer literal, got: $other")
    }
    (names, k)
  }
}

/** `bm25_topk(<docs view> [, k])` — s12's BM25 ranking over the
  * df-capped shingle index built from the named relation (columns
  * `doc_id`, `text`); query docs are the standard corpus slice
  * (doc_id % 50 = 0). Returns (q_id, doc_id, rk). */
object Bm25TopkTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("bm25_topk")

  val info: ExpressionInfo = new ExpressionInfo(
    Bm25TopkTvf.getClass.getName, "bm25_topk")

  def build(args: Seq[Expression]): LogicalPlan = {
    val (names, k) = RetrievalTvfs.parse("bm25_topk", args, nTables = 1)
    val docs = SparkSession.active.table(names.head)
    val (postings, sizes) = graft.operators.Similarity.lexIndex(docs)
    graft.operators.Similarity
      .bm25FromIndex(postings, sizes, k.getOrElse(5))
      .queryExecution.logical
  }
}

/** `knn_topk(<embeddings view> [, k])` — s04's IVF approximate
  * nearest neighbours over the named relation (columns `vec_id`,
  * `embedding`): sampled coarse quantizer
  * ([[graft.operators.Similarity.centModulus]] of the view's count,
  * one count job at plan build), nprobe=2 probe, exact re-rank.
  * Query vectors are the standard corpus slice (vec_id % 50 = 0).
  * Returns (q_id, vec_id, sim, rk). */
object KnnTopkTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("knn_topk")

  val info: ExpressionInfo = new ExpressionInfo(
    KnnTopkTvf.getClass.getName, "knn_topk")

  def build(args: Seq[Expression]): LogicalPlan = {
    val (names, k) = RetrievalTvfs.parse("knn_topk", args, nTables = 1)
    val s = SparkSession.active
    import org.apache.spark.sql.functions.col
    val sim = graft.operators.Similarity
    val emb = s.table(names.head).select(col("vec_id"), col("embedding"),
      sim.norm(col("embedding")).as("nrm"))
    val cents = emb
      .filter(col("vec_id") % sim.centModulus(emb.count()) === 7)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"),
        col("nrm").as("c_nrm"))
    sim.ivfProbe(emb, cents, sim.ivfAssignment(emb, cents),
        nprobe = 2, k = k.getOrElse(5))
      .queryExecution.logical
  }
}

/** `bm25_serve(<index dir> [, k])` — s12's BM25 ranking SERVED from a
  * stored w12-layout lexical index (postings + sizes read back from
  * parquet; query docs are the standard doc_id % 50 = 0 slice of the
  * stored postings). Closes the SQL prompt's index-LIFECYCLE gap:
  * `bm25_topk` re-derives the index from a view on every call, which
  * is the build bill — a deployment builds once (w12) and serves the
  * stored artifact, and until this TVF that serve path was DSL-only.
  * Because [[graft.operators.Similarity.lexIndex]] is deterministic,
  * serving the stored index over the same corpus is row-identical to
  * the inline build (the w12 oracle identity) — SqlParitySpec pins
  * `bm25_serve(dir)` == `bm25_topk(view)` through a real write/read
  * cycle. */
object Bm25ServeTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("bm25_serve")

  val info: ExpressionInfo = new ExpressionInfo(
    Bm25ServeTvf.getClass.getName, "bm25_serve")

  def build(args: Seq[Expression]): LogicalPlan = {
    val (names, k) = RetrievalTvfs.parse("bm25_serve", args, nTables = 1)
    val (postings, sizes) = graft.sources.Writers
      .readLexIndex(SparkSession.active, names.head)
    graft.operators.Similarity
      .bm25FromIndex(postings, sizes, k.getOrElse(5))
      .queryExecution.logical
  }
}

/** `knn_serve(<index dir>, <embeddings view> [, k])` — [[KnnTopkTvf]]'s
  * probe shape (nprobe=2, exact re-rank) against a STORED w07-layout
  * IVF index: centroids and (vec_id, c_id) lists read back from
  * parquet, the named corpus view re-attaching the vectors (st16's
  * serve convention — lists never duplicate the embeddings). A stored
  * index holding the same frozen quantizer and assignment is
  * row-identical to the inline `knn_topk` — SqlParitySpec pins it
  * through a real write/read cycle. */
object KnnServeTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("knn_serve")

  val info: ExpressionInfo = new ExpressionInfo(
    KnnServeTvf.getClass.getName, "knn_serve")

  def build(args: Seq[Expression]): LogicalPlan = {
    val (names, k) = RetrievalTvfs.parse("knn_serve", args, nTables = 2)
    val s = SparkSession.active
    import org.apache.spark.sql.functions.col
    val sim = graft.operators.Similarity
    val emb = s.table(names(1)).select(col("vec_id"), col("embedding"),
      sim.norm(col("embedding")).as("nrm"))
    val (cents, lists) = graft.sources.Writers.readIvfIndex(s, names.head)
    sim.ivfProbe(emb, cents, emb.join(lists, "vec_id"),
        nprobe = 2, k = k.getOrElse(5))
      .queryExecution.logical
  }
}

/** `hybrid_topk(<docs view>, <embeddings view> [, k])` — s13's
  * BM25 + IVF reciprocal-rank fusion over the named relations
  * (`doc_id`/`text` and `vec_id`/`embedding`). Returns
  * (q_id, id, rrf, rk). The sampled-centroid modulus is
  * [[graft.operators.Similarity.centModulus]] of the embedding
  * relation's row count — one count job at plan build (views are
  * arbitrary relations, so there is no fixture memo to consult). */
object HybridTopkTvf {

  val identifier: FunctionIdentifier = FunctionIdentifier("hybrid_topk")

  val info: ExpressionInfo = new ExpressionInfo(
    HybridTopkTvf.getClass.getName, "hybrid_topk")

  def build(args: Seq[Expression]): LogicalPlan = {
    val (names, k) = RetrievalTvfs.parse("hybrid_topk", args, nTables = 2)
    val s = SparkSession.active
    val emb0 = s.table(names(1))
    graft.operators.Similarity
      .bm25Hybrid(s.table(names.head), emb0,
        graft.operators.Similarity.centModulus(emb0.count()),
        k.getOrElse(3))
      .queryExecution.logical
  }
}
