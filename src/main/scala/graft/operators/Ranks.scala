package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for the one pattern that cannot survive a
  * 100× scale-up: `row_number()/sum().over(Window.orderBy(...))` with
  * no partitionBy, which funnels the ENTIRE input through a single
  * task (Spark plans it as `Exchange SinglePartition` + one sort).
  *
  * Two primitives cover every use in this repo:
  *   - [[tinyRank]]: rank the survivors of a distributed top-k
  *     (`orderBy(...).limit(k)` = TakeOrderedAndProject heap) by
  *     counting strict predecessors through a broadcast self-join —
  *     O(k²) comparisons on k rows, no global window node at all.
  *   - [[runningSum]]: the classic two-pass distributed prefix sum —
  *     bucket by an order-respecting function of the sort key, cumsum
  *     within buckets, add broadcast per-bucket offsets. Output values
  *     are exactly those of `sum().over(Window.orderBy(...)
  *     .rowsBetween(unboundedPreceding, currentRow))` (RanksSpec pins
  *     the equivalence), because the sort key is a total order and
  *     every cross-bucket predecessor lands in the offset.
  *
  * PlanSpec asserts the strongest property these enable: the fixed
  * query plans contain ZERO logical Window nodes with an empty
  * partitionSpec. */
object Ranks {

  /** Contract bound for [[tinyRank]]: the O(k²) broadcast nested-loop
    * is the DESIGN (it exists to rank the tiny survivor set of a
    * distributed top-k without any global window), so k must stay
    * tiny. 4096² = 16.8M comparisons is still trivial; anything
    * growing past this constant belongs in [[globalRank]]. */
  val TinyRankMaxK = 4096

  /** Dense 1..N rank over an ALREADY-SMALL frame (e.g. the k rows a
    * TakeOrderedAndProject produced) without a global window: each
    * row's rank is 1 + the number of rows whose (unique) sort key is
    * strictly smaller, counted via a broadcast nested-loop self-join.
    * k is bounded by [[TinyRankMaxK]] — larger frames are
    * [[globalRank]]'s job.
    *
    * `df` is evaluated three times (left side, broadcast key list,
    * and the caller's downstream use) — callers localCheckpoint the
    * limited frame first so the top-k heap runs once.
    *
    * Both contracts FAIL LOUDLY at execution, in the same pass that
    * computes the ranks: the self-join counts `<=` matches and splits
    * them into strict predecessors (the rank) and key-equal rows; a
    * duplicate key (equal-count > 1 — e.g. a hash-only key that
    * collided) or an over-budget frame (rank > [[TinyRankMaxK]])
    * raises instead of silently emitting fanned-out equal ranks.
    *
    * @param key a UNIQUE orderable key (use `struct(...)` for
    *            composite keys; struct comparison is lexicographic)
    * @param out output column name (LongType, values 1..N) */
  def tinyRank(df: DataFrame, key: Column, out: String): DataFrame = {
    val keyed = df.withColumn("__rk_k", key)
    val ranks = keyed.select(col("__rk_k"))
      .join(broadcast(keyed.select(col("__rk_k").as("__rk_b"))),
        col("__rk_b") <= col("__rk_k"), "left")
      .groupBy(col("__rk_k"))
      .agg(sum(when(col("__rk_b") < col("__rk_k"), 1L).otherwise(0L))
          .as("__rk_lt"),
        count(col("__rk_b")).as("__rk_le"))
      .select(col("__rk_k"),
        when(col("__rk_le") - col("__rk_lt") =!= 1L,
          // equal-count 0 happens only for a NULL key (matches nothing
          // in the <= join); > 1 is a genuine duplicate — name the
          // right violation so the caller debugs the actual defect
          raise_error(concat(
            when(col("__rk_le") - col("__rk_lt") === 0L,
              lit("tinyRank: null key (key must be orderable and" +
                " non-null)"))
              .otherwise(concat(lit("tinyRank: duplicate key "),
                col("__rk_k").cast("string"))))))
          .otherwise(
            when(col("__rk_lt") >= TinyRankMaxK,
              raise_error(lit(s"tinyRank: frame exceeds TinyRankMaxK=" +
                s"$TinyRankMaxK rows; use Ranks.globalRank")))
              .otherwise(col("__rk_lt") + 1L))
          .as(out))
    keyed.join(broadcast(ranks), "__rk_k").drop("__rk_k")
  }

  /** Distributed global running sum of `value` in the total order
    * `sortKeys` (frame UNBOUNDED PRECEDING .. CURRENT ROW), bucketed
    * by a caller-supplied `bucket` expression: materialize the narrow
    * (keys+value+bucket) frame once, aggregate per-bucket totals
    * (map-side-combinable, materialized — B rows), turn them into
    * broadcast offsets via a B×B self-join, then cumsum within each
    * bucket (Window.partitionBy(bucket)) and add the bucket's offset.
    * ONE scan of the input, one bucket shuffle, no window without
    * partitionBy anywhere. (Measured alternatives at fixture scale:
    * repartitionByRange+pid pays a sampling job and a wide
    * checkpoint; deriving totals from max(cumsum) loses scan reuse to
    * column pruning — 3 scans, ReuseExchange never fires.)
    *
    * `bucket` MUST be a pure function of the sort key that respects
    * the total order (b(x) < b(y) whenever x precedes y across
    * buckets) — e.g. a leading hex prefix of a hash sort key, or the
    * (negated) leading numeric key. Purity removes the determinism
    * hazard that forced the repartitionByRange variant to checkpoint
    * its WIDE ranged frame (sampling could legally pick different
    * boundaries per execution); here the checkpoint is only a cost
    * choice — skip it and the result is still exact. Order-respect is
    * what makes offset+local exact. Bucket-count guidance: a few
    * hundred — enough spread for the per-bucket windows, trivial for
    * the broadcast self-join. */
  def runningSum(df: DataFrame, bucket: Column, sortKeys: Seq[Column],
      value: Column, out: String): DataFrame =
    stratifiedRunningSum(df, Nil, bucket, sortKeys, value, out)

  /** [[runningSum]] computed INDEPENDENTLY within each stratum — the
    * per-group form of the same two-pass prefix sum: cross-bucket
    * offsets only accumulate buckets of the SAME stratum (the offset
    * self-join adds stratum-equality to its `bucket <` condition), so
    * each stratum restarts at zero while the physical shape is
    * unchanged — one (stratum, bucket)-partitioned window over many
    * small groups, never one task per stratum. This is what makes a
    * per-stratum rank scale-safe when strata are FEW and HUGE (five
    * languages over 100 TB): `Window.partitionBy(stratum)` alone would
    * funnel a fifth of the corpus through one task, the same
    * single-task funnel the empty-partitionSpec invariant bans. */
  def stratifiedRunningSum(df: DataFrame, strata: Seq[Column],
      bucket: Column, sortKeys: Seq[Column],
      value: Column, out: String): DataFrame = {
    // narrow by contract (callers project keys+value only); both the
    // totals pass and the window pass read THIS, not the source scan.
    // At cluster scale: persist(DISK_ONLY) instead.
    val sCols = strata.indices.map(i => s"__ps_s$i")
    val withB = sCols.zip(strata)
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .withColumn("__ps_b", bucket).localCheckpoint()
    val grp = sCols :+ "__ps_b"
    val totals = withB.groupBy(grp.map(col): _*).agg(sum(value).as("__ps_t"))
      .localCheckpoint() // B rows; the self-join would re-aggregate twice
    // NULL-AWARE bucket ordering: `<` alone is null-false both ways, so
    // a null bucket would get offset 0 (colliding with the first
    // non-null bucket) AND be excluded from every other bucket's
    // offset. Order the null bucket FIRST (the NULLS FIRST convention
    // the per-bucket windows also use), so its total feeds every
    // non-null bucket and its own rows keep offset 0 — exactly
    // row_number's treatment of a null leading sort key under
    // ASCENDING order. CONTRACT NOTE: this fixes null-first only —
    // a caller sorting DESC (Spark desc = NULLS LAST) whose null sort
    // keys reach a null bucket must map those nulls into an explicit
    // last-ordered bucket value instead (all current callers derive
    // buckets from non-null keys; RanksSpec pins the asc path).
    val bucketBefore = (col("__ps_bb") < col("__ps_b")) ||
      (col("__ps_bb").isNull && col("__ps_b").isNotNull)
    val offsets = totals
      .join(broadcast(totals.select(
          (sCols.map(n => col(n).as(s"${n}_b")) :+
            col("__ps_b").as("__ps_bb") :+ col("__ps_t").as("__ps_tb")): _*)),
        sCols.map(n => col(s"${n}_b") <=> col(n))
          .foldLeft(bucketBefore)(_ && _), "left")
      .groupBy(grp.map(col): _*)
      .agg(coalesce(sum(col("__ps_tb")), lit(0L)).as("__ps_off"))
    val wLocal = Window.partitionBy(grp.map(col): _*)
      .orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // NULL-SAFE final join: a using-columns join resolves to EqualTo,
    // which silently drops rows whose stratum (or bucket) is null —
    // but `row_number() OVER (PARTITION BY s)` ranks the null group
    // like any other, and the offsets self-join above already matches
    // nulls via <=>. Join on <=> for every group column so the null
    // stratum gets its rank instead of vanishing (RanksSpec pins it).
    val offR = offsets.select(
      (grp.map(n => col(n).as(s"${n}_o")) :+ col("__ps_off")): _*)
    withB.withColumn("__ps_loc", sum(value).over(wLocal))
      .join(broadcast(offR),
        grp.map(n => col(n) <=> col(s"${n}_o")).reduce(_ && _))
      .withColumn(out, col("__ps_loc") + col("__ps_off"))
      .drop((grp ++ grp.map(n => s"${n}_o") ++
        Seq("__ps_loc", "__ps_off")): _*)
  }

  /** Global 1..N row rank in the total order `sortKeys` — a running
    * count. Long-typed (row_number() is int; callers cast if the
    * narrower type matters). */
  def globalRank(df: DataFrame, bucket: Column, sortKeys: Seq[Column],
      out: String): DataFrame =
    runningSum(df, bucket, sortKeys, lit(1L), out)

  /** 1..N(stratum) row rank within each stratum in the total order
    * `sortKeys` — `row_number() OVER (PARTITION BY stratum ORDER BY
    * ...)` without a per-stratum single task (see
    * [[stratifiedRunningSum]]). `bucket` must be order-respecting
    * w.r.t. `sortKeys` within every stratum, the same contract as
    * [[runningSum]]. */
  def stratumRank(df: DataFrame, strata: Seq[Column], bucket: Column,
      sortKeys: Seq[Column], out: String): DataFrame =
    stratifiedRunningSum(df, strata, bucket, sortKeys, lit(1L), out)
}
