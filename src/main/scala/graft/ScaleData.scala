package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builds an inflated scale fixture (sf1 from sf0.1) for the
  * BASELINE.md scale-step table: the FACT tables (lineitem, orders,
  * events, documents, embeddings) replicate `factor`× with shifted
  * keys and graded mutations — the ScaleStressSpec inflation recipe
  * applied at fixture level — while the dimension tables copy
  * verbatim, the realistic scale step where facts outgrow dims.
  *
  * Mutations keep the inflated data NON-degenerate for the operators
  * under test: document copies replace a position-graded token subset
  * (so dedup sees near-duplicates across a Jaccard band, not 10-way
  * identical clones), embedding copies add per-(copy, dim) md5 noise
  * (strong-but-not-identical cosine neighbors), event copies jitter
  * ±15 s (copies interleave with neighboring originals).
  *
  * 100 TB posture: every inflation is a map-only projection unioned
  * `factor` times over the base scan — no shuffles, no driver loops;
  * the only driver reads are three scalar key maxima.
  *
  * Usage: runMain graft.ScaleData <baseDir> <outDir> [factor=10]
  */
object ScaleData {
  /** md5-derived deterministic noise in [-0.05, 0.05] — the
    * ScaleStressSpec construction, fixture-level. */
  private def noiseW(c: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"stress:$c:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    (java.lang.Long.parseLong(hex, 16) % 2001 - 1000).toDouble / 1000.0 * 0.05
  }

  def main(args: Array[String]): Unit = {
    val base = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val docKeyed = args.length > 3 && args(3) == "docKeyed"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    build(spark, base, out, factor, docKeyed)
    spark.stop()
  }

  /** The inflation itself, callable in-process (Sf1PlanSpec reuses it
    * to generate the fixture when tmp/sf1 is absent).
    *
    * `docKeyedMarkers` (the sf10 scheme, round 14): the legacy document
    * mutation keys replacement tokens by POSITION ONLY (`mrk{i%10}`),
    * which is fine for one decade but DEGENERATE at 100× — high-
    * replacement copies of DIFFERENT base docs become textually
    * near-identical (their text is position-determined), collapsing
    * ~10^5 docs into one mega-cluster whose LSH self-join legitimately
    * explodes to ~10^8+ candidate pairs (~70 GB of shuffle spill — a
    * generator artifact, not a property of real corpora). And CLUSTER
    * SIZE must not scale with the corpus either: 100 graded copies per
    * base make every exact pair-enumerating operator's TRUE ANSWER
    * grow quadratically in the copy count (25M+ qualifying pairs is
    * the answer, not wasted work) — real crawls grow the NUMBER of
    * dup clusters with corpus size, not their size. So the doc-keyed
    * scheme keeps sf1's cluster shape and multiplies cluster COUNT:
    * copies are grouped into BANDS of 10 (band b = c/10, j = c%10);
    * bands 1+ rewrite a fixed ~35% position slice with
    * (doc, band)-keyed markers (mutually dissimilar bands — 3-gram
    * survival across bands ≈ token-share³ ≪ any dedup threshold),
    * and within a band position i%10 < j is replaced with a
    * (doc, copy)-keyed marker (the sf1 grading, zero cross-copy
    * collisions). Result: 10× the clusters of sf1, each a 10-copy
    * graded Jaccard band around its base — answer sizes scale
    * LINEARLY with the corpus. sf1 keeps the legacy scheme so its
    * committed anchor table stays valid byte-for-byte. */
  /** Orders-only inflation (the referential-integrity okStep scheme:
    * orderkey-shifted copies, custkeys unchanged) — callable
    * standalone so ScaleStressSpec's sf10 SCD2-chain test can
    * self-provision a 100x orders table when the full tmp/sf10
    * fixture is absent, without paying the documents/embeddings
    * inflation it doesn't need. Returns the okStep used, for callers
    * (build) that inflate lineitem consistently. */
  def inflateOrders(spark: SparkSession, base: String, out: String,
      factor: Int): Long = {
    import spark.implicits._
    val orders = spark.read.parquet(s"$base/orders.parquet")
    val okStep = orders.agg(max($"o_orderkey")).head.getLong(0) + 1
    (0 until factor).map { c =>
      orders.withColumn("o_orderkey", $"o_orderkey" + c * okStep)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    println("[scaledata] wrote orders")
    okStep
  }

  def build(spark: SparkSession, base: String, out: String,
      factor: Int, docKeyedMarkers: Boolean = false): Unit = {
    import spark.implicits._

    def rd(t: String): DataFrame = spark.read.parquet(s"$base/$t.parquet")
    def wr(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaledata] wrote $t")
    }

    // dimensions: verbatim
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => wr(rd(t), t))

    // orders + lineitem: orderkey-shifted copies keep referential
    // integrity (every copied lineitem still joins its copied order;
    // custkeys unchanged — 10x orders per customer)
    val okStep = inflateOrders(spark, base, out, factor)
    wr((0 until factor).map { c =>
      rd("lineitem").withColumn("l_orderkey", $"l_orderkey" + c * okStep)
    }.reduce(_ unionByName _), "lineitem")

    // events: per-key 10x (user_id unchanged), copies jittered ±15 s
    val evStep = rd("events").agg(max($"event_id")).head.getLong(0) + 1
    wr((0 until factor).map { c =>
      val ev = rd("events")
        .withColumn("event_id", $"event_id" + c * evStep)
      if (c == 0) ev
      else ev
        .withColumn("__jit",
          ($"event_id" * 2654435761L + c * 1000003L)
            .bitwiseAND(0x7fffffffL) % 30000000L - 15000000L)
        .withColumn("ts", expr("timestampadd(MICROSECOND, __jit, ts)"))
        .drop("__jit")
    }.reduce(_ unionByName _), "events")

    // documents: position-graded token replacement (adjacent copies
    // overlap heavily, distant copies diverge — true near-dup pairs
    // populate a band around the 0.5 Jaccard threshold)
    val docStep = rd("documents").agg(max($"doc_id")).head.getLong(0) + 1
    wr((0 until factor).map { c =>
      val docs = rd("documents")
      val t =
        if (c == 0) $"text"
        else if (docKeyedMarkers) {
          val band = c / 10; val j = c % 10
          concat_ws(" ", transform(split($"text", " "), (tok, i) =>
            when(lit(band > 0) && (i + lit(7 * band)) % 17 < 6,
              concat(lit("b"), $"doc_id".cast("string"), lit("x"),
                lit(band.toString), lit("x"), (i % 17).cast("string")))
              .when(i % 10 < j,
                // keyed by (doc, band, position) — NOT copy — so
                // copies j < j' of one band SHARE their marked
                // positions' values: exactly sf1's graded overlap
                // shape, replicated per band with zero cross-band or
                // cross-doc collisions
                concat(lit("m"), $"doc_id".cast("string"), lit("x"),
                  lit(band.toString), lit("x"), (i % 10).cast("string")))
              .otherwise(tok)))
        }
        else concat_ws(" ", transform(split($"text", " "),
          (tok, i) => when(i % 10 < c,
            concat(lit("mrk"), (i % 10).cast("string"))).otherwise(tok)))
      docs.select(($"doc_id" + c * docStep).as("doc_id"), t.as("text"),
        $"lang", $"source", length(t).cast("long").as("n_chars"))
    }.reduce(_ unionByName _), "documents")

    // embeddings: per-(copy, dim) noise — strong cosine neighbors
    val emb = rd("embeddings")
    val dim = emb.select(size($"embedding")).head.getInt(0)
    val vStep = emb.agg(max($"vec_id")).head.getLong(0) + 1
    wr((0 until factor).map { c =>
      if (c == 0) emb
      else {
        val noise = array((0 until dim).map(i => lit(noiseW(c, i))): _*)
        emb.select(($"vec_id" + c * vStep).as("vec_id"),
          zip_with($"embedding", noise,
            (x, n) => (x.cast("double") + n).cast("float")).as("embedding"),
          $"label")
      }
    }.reduce(_ unionByName _), "embeddings")
  }
}
