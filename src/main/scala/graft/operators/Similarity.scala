package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.sources.Tables

/** Similarity search over the embeddings table (ArrayType(FloatType),
  * dim 64): brute-force cosine top-k as the exactness baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * 100 TB design notes:
  *   - The dot product runs in double precision via zip_with/aggregate —
  *     codegen'd, no UDF, summation strictly left-to-right so results
  *     are bit-identical across engines and partitionings.
  *   - Brute force is a blocked cross join: queries × corpus. It is THE
  *     correct baseline at small query counts (cost Q×N×d flops spread
  *     over the cluster) but quadratic in corpus size if all-pairs;
  *     never run all-pairs at scale — s02's LSH bucketing (or an IVF
  *     coarse quantizer) bounds each query's candidate set.
  *   - LSH hyperplanes are pseudo-random from a hash of (plane, dim) —
  *     no driver-side randomness, reproducible on any cluster shape.
  */
object Similarity {

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Dot product of two float-array columns in double precision with
    * deterministic left-to-right summation — the codegen'd
    * [[graft.functions.FloatVecDot]] kernel (no per-pair allocation,
    * bit-identical to the HOF formulation and DuckDB list_dot_product). */
  def dot(a: Column, b: Column): Column =
    column(graft.functions.FloatVecDot(expression(a), expression(b)))

  /** Euclidean norm of a float-array column (double). */
  def norm(a: Column): Column =
    column(graft.functions.FloatVecNorm(expression(a)))

  /** Cosine similarity — for one-off pair scoring. For joins, precompute
    * [[norm]] per side once and divide a single [[dot]] (see s03): norm
    * recomputation per candidate pair triples the array traversals. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def queriesSet(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
  }

  /** s01: brute-force cosine top-k (k=5) for a deterministic query
    * subset. Broadcast the (small) query side; the corpus streams. */
  val s01KnnBrute: Q = Q(
    "s01_knn_brute",
    """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
      |           FROM embeddings WHERE vec_id % 50 = 0),
      |c AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
      |scored AS (
      |  SELECT q.q_id, c.vec_id,
      |    round(list_dot_product(q.q_vec, c.vec) /
      |      (sqrt(list_dot_product(q.q_vec, q.q_vec)) *
      |       sqrt(list_dot_product(c.vec, c.vec))), 6) AS sim,
      |    row_number() OVER (PARTITION BY q.q_id
      |      ORDER BY list_dot_product(q.q_vec, c.vec) /
      |        (sqrt(list_dot_product(q.q_vec, q.q_vec)) *
      |         sqrt(list_dot_product(c.vec, c.vec))) DESC, c.vec_id) AS rk
      |  FROM q CROSS JOIN c WHERE q.q_id <> c.vec_id)
      |SELECT q_id, vec_id, sim, rk FROM scored WHERE rk <= 5""".stripMargin) {
    (s, d) =>
      import s.implicits._
      val corpus = Tables.embeddings(s, d)
        .select($"vec_id", $"embedding".as("vec"), norm($"embedding").as("cn"))
      val scored = queriesSet(s, d)
        .withColumn("qn", norm($"q_vec"))
        .crossJoin(corpus)
        .filter($"q_id" =!= $"vec_id")
        .select($"q_id", $"vec_id",
          (dot($"q_vec", $"vec") / ($"qn" * $"cn")).as("sim0"))
      val w = Window.partitionBy($"q_id").orderBy($"sim0".desc, $"vec_id")
      scored.withColumn("rk", row_number().over(w))
        .filter($"rk" <= 5)
        .select($"q_id", $"vec_id", round($"sim0", 6).as("sim"), $"rk")
  }

  /** Hyperplane weight w(p, i) = ((first-8-hex of md5("p:i")) mod 2001
    * - 1000) / 1000.0 — a PORTABLE pseudo-random family in [-1, 1]:
    * the same value is recomputable in any engine with md5 + integer
    * arithmetic + one double divide, which is what lets the s02 sketch
    * be oracle-checked (xxhash64 weights kept it rows-only). The
    * planes are pure functions of (p, i) — constants, not data — so
    * they are materialized as literal arrays (the broadcast-a-tiny-
    * table pattern at its degenerate size; nothing data-dependent
    * happens on the driver). */
  private def planeWeight(p: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    (java.lang.Long.parseLong(hex, 16) % 2001 - 1000).toDouble / 1000.0
  }

  /** Sign-bit sketch under `nPlanes` md5-derived hyperplanes. */
  def hyperplaneSketch(vec: Column, nPlanes: Int, dim: Int): Column =
    array((0 until nPlanes).map { p =>
      val plane = array((0 until dim).map(i => lit(planeWeight(p, i))): _*)
      val dot = aggregate(
        zip_with(vec, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, 1).otherwise(0)
    }: _*)

  /** s02: LSH-bucketed ANN — candidates share at least one 8-bit
    * hyperplane band with the query, then exact cosine re-rank within
    * candidates. Bounded work per query; recall measured vs s01 in
    * SimilaritySpec. The md5-derived plane family makes the whole
    * sketch→band→re-rank pipeline oracle-checkable: the oracle
    * recomputes the planes from scratch in SQL and must land on the
    * same buckets AND the same rounded similarities. */
  val s02KnnLsh: Q = Q(
    "s02_knn_lsh",
    """WITH dims AS (SELECT unnest(range(0, 64)) AS i),
      |ps AS (SELECT unnest(range(0, 16)) AS p),
      |planes AS (
      |  SELECT p, list(CAST((('0x' || substr(md5(CAST(p AS VARCHAR)
      |      || ':' || CAST(i AS VARCHAR)), 1, 8))::BIGINT % 2001 - 1000)
      |      AS DOUBLE) / 1000.0 ORDER BY i) AS pv
      |  FROM ps, dims GROUP BY p),
      |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |bits AS (
      |  SELECT e.vec_id, pl.p,
      |    CASE WHEN list_dot_product(e.v, pl.pv) >= 0 THEN 1 ELSE 0 END
      |      AS bit
      |  FROM emb e CROSS JOIN planes pl),
      |sigs AS (
      |  SELECT vec_id, p // 8 AS band,
      |    CAST(sum(bit << (p % 8)) AS BIGINT) AS sig
      |  FROM bits GROUP BY vec_id, p // 8),
      |cands AS (
      |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS vec_id
      |  FROM sigs q JOIN sigs c
      |    ON q.band = c.band AND q.sig = c.sig
      |  WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
      |scored AS (
      |  SELECT cd.q_id, cd.vec_id,
      |    list_dot_product(a.v, b.v) /
      |      (sqrt(list_dot_product(a.v, a.v)) *
      |       sqrt(list_dot_product(b.v, b.v))) AS sim0
      |  FROM cands cd
      |  JOIN emb a ON a.vec_id = cd.q_id
      |  JOIN emb b ON b.vec_id = cd.vec_id),
      |r AS (SELECT q_id, vec_id, sim0,
      |        row_number() OVER (PARTITION BY q_id
      |          ORDER BY sim0 DESC, vec_id) AS rk
      |      FROM scored)
      |SELECT q_id, vec_id, round(sim0, 6) AS sim, rk
      |FROM r WHERE rk <= 5""".stripMargin) { (s, d) =>
    import s.implicits._
    val nPlanes = 16
    val bandBits = 8
    val nBands = nPlanes / bandBits
    val dim = 64
    val emb = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding",
        hyperplaneSketch($"embedding", nPlanes, dim).as("bits"))
    // bits is lambda-bound: with a plain column reference, projection
    // inlining re-evaluates the 16-plane sketch once PER BAND.
    val banded = emb.select($"vec_id", $"embedding",
      explode(graft.functions.Grams.bindArray($"bits") { bits =>
        array((0 until nBands).map(b => struct(
          lit(b).as("band"),
          aggregate(zip_with(
            slice(bits, lit(b * bandBits + 1), lit(bandBits)),
            sequence(lit(0), lit(bandBits - 1)),
            (bit, i) => bit * call_function("shiftleft", lit(1), i)),
            lit(0), (acc, v) => acc + v).as("sig"))): _*)
      }).as("bb"))
      .select($"vec_id", $"embedding", $"bb.band", $"bb.sig")
    val qs = banded.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"band", $"sig")
    val cands = qs.join(banded, Seq("band", "sig"))
      .filter($"q_id" =!= $"vec_id")
      .select($"q_id", $"q_vec", $"vec_id", $"embedding")
      .distinct()
    val w = Window.partitionBy($"q_id").orderBy($"sim0".desc, $"vec_id")
    cands
      .select($"q_id", $"vec_id", cosine($"q_vec", $"embedding").as("sim0"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"q_id", $"vec_id", round($"sim0", 6).as("sim"), $"rk")
  }

  /** s03: embedding-cosine near-duplicate pairs (all-pairs at fixture
    * scale as ground truth; the documented scale path is s02-style
    * bucketing first). Threshold 0.42 picked against the fixture's sim
    * distribution (near-random embeddings, max pairwise sim ≈ 0.51 —
    * the `label` column is NOT a cosine-cluster id in this data) to
    * yield a small, stable pair set. */
  val s03CosineDedup: Q = Q(
    "s03_cosine_dedup",
    """WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec
      |           FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  a.label AS label_a, b.label AS label_b,
      |  round(list_dot_product(a.vec, b.vec) /
      |    (sqrt(list_dot_product(a.vec, a.vec)) *
      |     sqrt(list_dot_product(b.vec, b.vec))), 6) AS sim
      |FROM c a JOIN c b ON a.vec_id < b.vec_id
      |WHERE list_dot_product(a.vec, b.vec) /
      |    (sqrt(list_dot_product(a.vec, a.vec)) *
      |     sqrt(list_dot_product(b.vec, b.vec))) > 0.42""".stripMargin) {
    (s, d) =>
      import s.implicits._
      // Precompute each vector's norm ONCE (map-side) — the pair-level
      // work is then a single dot product instead of three array
      // traversals; same arithmetic as the oracle: dot / (na * nb).
      val c = Tables.embeddings(s, d)
        .select($"vec_id", $"label", $"embedding",
          norm($"embedding").as("nrm"))
      val a = c.select($"vec_id".as("id_a"), $"label".as("label_a"),
        $"embedding".as("va"), $"nrm".as("na"))
      val b = c.select($"vec_id".as("id_b"), $"label".as("label_b"),
        $"embedding".as("vb"), $"nrm".as("nb"))
      a.join(b, $"id_a" < $"id_b")
        .withColumn("sim0", dot($"va", $"vb") / ($"na" * $"nb"))
        .filter($"sim0" > 0.42)
        .select($"id_a", $"id_b", $"label_a", $"label_b",
          round($"sim0", 6).as("sim"))
  }

  /** s04: IVF (inverted-file) ANN — coarse quantizer + probed buckets.
    *
    * Centroids are a deterministic sample of the corpus (every 100th
    * vector — stands in for k-means centroids, which would be trained
    * offline at scale). Every vector is assigned to its nearest
    * centroid (broadcast nested-loop over the small centroid set, one
    * map-side pass); queries probe the `nprobe`=2 nearest centroid
    * buckets and re-rank exactly within them. Candidate work per query
    * is bounded by the probed buckets — the 100 TB path where brute
    * force (s01) is quadratic. Recall measured vs s01 in SimilaritySpec.
    * Fully deterministic (sampled centroids, tie-broken windows), so it
    * carries a complete DuckDB oracle mirroring every stage. */
  val s04KnnIvf: Q = Q(
    "s04_knn_ivf",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
      |    AS nrm FROM embeddings),
      |cen AS (SELECT vec_id AS c_id, vec AS c_vec, nrm AS c_nrm
      |        FROM e WHERE vec_id % 100 = 7),
      |assigned AS (
      |  SELECT vec_id, vec, nrm, c_id FROM (
      |    SELECT e.vec_id, e.vec, e.nrm, cen.c_id,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_dot_product(e.vec, cen.c_vec) /
      |          (e.nrm * cen.c_nrm) DESC, cen.c_id) AS crk
      |    FROM e CROSS JOIN cen)
      |  WHERE crk = 1),
      |q AS (SELECT vec_id AS q_id, vec AS q_vec, nrm AS q_nrm
      |      FROM e WHERE vec_id % 50 = 0),
      |probes AS (
      |  SELECT q_id, q_vec, q_nrm, c_id FROM (
      |    SELECT q.q_id, q.q_vec, q.q_nrm, cen.c_id,
      |      row_number() OVER (PARTITION BY q.q_id
      |        ORDER BY list_dot_product(q.q_vec, cen.c_vec) /
      |          (q.q_nrm * cen.c_nrm) DESC, cen.c_id) AS crk
      |    FROM q CROSS JOIN cen)
      |  WHERE crk <= 2),
      |ranked AS (
      |  SELECT p.q_id, a.vec_id,
      |    round(list_dot_product(p.q_vec, a.vec) / (p.q_nrm * a.nrm), 6)
      |      AS sim,
      |    row_number() OVER (PARTITION BY p.q_id
      |      ORDER BY list_dot_product(p.q_vec, a.vec) / (p.q_nrm * a.nrm)
      |        DESC, a.vec_id) AS rk
      |  FROM probes p JOIN assigned a USING (c_id)
      |  WHERE p.q_id <> a.vec_id)
      |SELECT q_id, vec_id, sim, rk FROM ranked WHERE rk <= 5""".stripMargin) {
    (s, d) =>
    import s.implicits._
    val nprobe = 2
    val emb = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding", norm($"embedding").as("nrm"))
    val centroids = emb.filter($"vec_id" % 100 === 7)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"),
        $"nrm".as("c_nrm"))
    // assign: nearest centroid per vector (broadcast the centroid set)
    val wAssign = Window.partitionBy($"vec_id").orderBy($"c_sim".desc, $"c_id")
    val assigned = emb.join(broadcast(centroids))
      .select($"vec_id", $"embedding", $"nrm", $"c_id",
        (dot($"embedding", $"c_vec") / ($"nrm" * $"c_nrm")).as("c_sim"))
      .withColumn("crk", row_number().over(wAssign))
      .filter($"crk" === 1)
      .select($"vec_id", $"embedding", $"nrm", $"c_id")
    // queries probe their nprobe nearest centroids
    val qs = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"),
        $"nrm".as("q_nrm"))
    val wProbe = Window.partitionBy($"q_id").orderBy($"c_sim".desc, $"c_id")
    val probes = qs.join(broadcast(centroids))
      .select($"q_id", $"q_vec", $"q_nrm", $"c_id",
        (dot($"q_vec", $"c_vec") / ($"q_nrm" * $"c_nrm")).as("c_sim"))
      .withColumn("crk", row_number().over(wProbe))
      .filter($"crk" <= nprobe)
      .select($"q_id", $"q_vec", $"q_nrm", $"c_id")
    // candidates = vectors in probed buckets; exact re-rank
    val wRank = Window.partitionBy($"q_id").orderBy($"sim0".desc, $"vec_id")
    probes.join(assigned, "c_id")
      .filter($"q_id" =!= $"vec_id")
      .select($"q_id", $"vec_id",
        (dot($"q_vec", $"embedding") / ($"q_nrm" * $"nrm")).as("sim0"))
      .withColumn("rk", row_number().over(wRank))
      .filter($"rk" <= 5)
      .select($"q_id", $"vec_id", round($"sim0", 6).as("sim"), $"rk")
  }

  /** s05: symmetric int8 embedding quantization — the standard 4×
    * storage/bandwidth shrink before ANN indexing (scale = 127/max|x|
    * per vector, values rounded into [-127, 127]). Emits per-vector
    * audit scalars: the quantized-sum checksum (cross-engine content
    * proof without array columns) and the worst-case reconstruction
    * error, whose bound is 0.5/scale by construction.
    *
    * Map-only over the corpus — no shuffle at any scale; all arithmetic
    * in double via codegen'd higher-order expressions, bit-identical to
    * the oracle's list comprehensions. */
  val s05Quantize: Q = Q(
    "s05_quantize",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |        127.0 / list_max([abs(x) FOR x IN v]) AS scale FROM e),
      |q AS (SELECT vec_id, v, scale,
      |        [CAST(round(x * scale) AS BIGINT) FOR x IN v] AS qv FROM s)
      |SELECT vec_id, CAST(len(v) AS BIGINT) AS n_dims,
      |  CAST(list_sum(qv) AS BIGINT) AS q_checksum,
      |  round(scale, 6) AS scale,
      |  CAST(floor(list_max([abs(v[i] - qv[i] / scale)
      |                       FOR i IN range(1, len(v) + 1)]) * 1e8)
      |       AS BIGINT) AS max_err_e8
      |FROM q""".stripMargin) { (s, d) =>
    import s.implicits._
    // max_err is emitted as floor(err * 1e8): the doubles are
    // bit-identical cross-engine (IEEE ops on identical inputs), but
    // decimal ROUNDING of a continuum value is not — Spark rounds the
    // full binary expansion via BigDecimal while DuckDB multiplies-and-
    // rounds, and a value near a tie (…4499999…) splits them. floor of
    // the identical double is deterministic.
    val v = transform($"embedding", x => x.cast("double"))
    Tables.embeddings(s, d)
      .select($"vec_id", v.as("v"),
        (lit(127.0) / array_max(transform(v, abs(_)))).as("scale"))
      .select($"vec_id", $"v", $"scale",
        transform($"v", x => round(x * $"scale").cast("long")).as("qv"))
      .select($"vec_id",
        size($"v").cast("long").as("n_dims"),
        aggregate($"qv", lit(0L), _ + _).as("q_checksum"),
        $"scale",
        floor(array_max(zip_with($"v", $"qv",
          (x, q) => abs(x - q / $"scale"))) * 1e8).as("max_err_e8"))
      // Rounding `scale` for display happens one select DOWNSTREAM of
      // every use: Spark 4's lateral-column-alias resolution makes a
      // same-select `round(scale,6).as("scale")` shadow the child's
      // `scale` inside sibling lambda expressions — the error divisor
      // silently became the 6-dp value and moved floor(err*1e8) by one.
      .select($"vec_id", $"n_dims", $"q_checksum",
        round($"scale", 6).as("scale"), $"max_err_e8")
  }

  /** s06: distributed k-means (Lloyd) over the embedding corpus — the
    * TRAINING side of the coarse quantizer s04 consumes (s04's
    * every-100th "centroids" stand in for exactly this output).
    *
    * Deterministic end to end, no driver-side math: init picks the k
    * vectors with the smallest xxhash64(vec_id) (data-derived,
    * seed-stable); each Lloyd round is (1) a broadcast of the k-row
    * centroid table against the corpus — squared-L2 via the precomputed
    * point norm and one dot product per (point, centroid), argmin by
    * row_number — and (2) a centroid update by posexplode to
    * (cluster, dim) cells, partial-aggregated map-side, reassembled
    * with array_sort∘collect_list over ≤ k·dims rows. Empty clusters
    * carry their previous centroid forward. Centroids are
    * localCheckpointed per round (k rows); the corpus is never
    * materialized. At 100 TB each round is two linear passes — the
    * standard scalable k-means shape (k-means∥ init would replace the
    * hash-min seed, same round structure).
    *
    * All distances in full double precision (HOF dot — linear here, k
    * products per point, not the N² pair case the FloatVecDot kernel
    * exists for). Output is the bounds-verdict pattern (q35a): scalars
    * the oracle can pin — corpus size and the Lloyd invariant that
    * within-cluster SSE is non-increasing over rounds (exact in Lloyd;
    * epsilon-guarded against last-ulp summation jitter at convergence).
    * SimilaritySpec asserts the sharper facts: k clusters survive,
    * assignments are stable across independent builds, SSE decreases
    * strictly on round 1. */
  /** Lloyd k-means internals: returns (final assignment with columns
    * (vec_id, c_id, d2), per-round SSE 1-row frames). See [[s06Kmeans]]
    * for the design rationale; exposed so SimilaritySpec can assert the
    * sharper invariants the bounds-verdict output can't carry. */
  def kmeans(s: SparkSession, d: String, k: Int = 8, rounds: Int = 3)
      : (DataFrame, Seq[DataFrame]) = {
    import s.implicits._
    val dvec = transform($"embedding", x => x.cast("double"))
    def ddot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

    val pts = Tables.embeddings(s, d)
      .select($"vec_id", dvec.as("v"))
      .withColumn("n2", ddot($"v", $"v"))

    var cents = pts
      .withColumn("hrk", row_number().over(
        Window.orderBy(xxhash64($"vec_id"), $"vec_id")))
      .filter($"hrk" <= k)
      .select($"hrk".as("c_id"), $"v".as("c_vec"))
      .withColumn("c_n2", ddot($"c_vec", $"c_vec"))
      .localCheckpoint()

    def assign(c: DataFrame): DataFrame = pts
      .crossJoin(broadcast(c))
      .withColumn("d2", $"n2" - lit(2.0) * ddot($"v", $"c_vec") + $"c_n2")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"d2".asc, $"c_id".asc)))
      .filter($"rk" === 1)

    val sses = collection.mutable.Buffer.empty[DataFrame]
    for (_ <- 1 to rounds) {
      // materialize the round's assignment once: both the SSE aggregate
      // and the centroid update read it (on a cluster: persist(DISK))
      val a = assign(cents).localCheckpoint()
      sses += a.agg(sum($"d2").as("sse"))
      val updated = a
        .select($"c_id", posexplode($"v").as(Seq("dim", "x")))
        .groupBy($"c_id", $"dim")
        .agg((sum($"x") / count($"x")).as("m"))
        .groupBy($"c_id")
        .agg(array_sort(collect_list(struct($"dim", $"m"))).as("pairs"))
        .select($"c_id".as("u_id"),
          expr("transform(pairs, p -> p.m)").as("u_vec"))
      cents = cents
        .join(updated, $"c_id" === $"u_id", "left")
        .select($"c_id", coalesce($"u_vec", $"c_vec").as("c_vec"))
        .withColumn("c_n2", ddot($"c_vec", $"c_vec"))
        .localCheckpoint()
    }
    (assign(cents).select($"vec_id", $"c_id", $"d2"), sses.toSeq)
  }

  val s06Kmeans: Q = Q(
    "s06_kmeans",
    """SELECT (SELECT count(*) FROM embeddings) AS n_points,
      |  true AS all_assigned, true AS sse_monotone,
      |  true AS sse_positive""".stripMargin) { (s, d) =>
    import s.implicits._
    val (finalAssign, sses) = kmeans(s, d)
    val Seq(s1, s2, s3) = sses.map(df => df.select($"sse".as("v")))
    finalAssign.agg(count(lit(1)).as("n_assigned"))
      .crossJoin(Tables.embeddings(s, d).agg(count(lit(1)).as("n_points")))
      .crossJoin(broadcast(s1.select($"v".as("sse1"))))
      .crossJoin(broadcast(s2.select($"v".as("sse2"))))
      .crossJoin(broadcast(s3.select($"v".as("sse3"))))
      .select($"n_points",
        ($"n_assigned" === $"n_points").as("all_assigned"),
        ($"sse2" <= $"sse1" * 1.000001 && $"sse3" <= $"sse2" * 1.000001)
          .as("sse_monotone"),
        ($"sse3" > 0.0).as("sse_positive"))
  }

  val all: Seq[Q] = Seq(s01KnnBrute, s02KnnLsh, s03CosineDedup, s04KnnIvf,
    s05Quantize, s06Kmeans)
}
