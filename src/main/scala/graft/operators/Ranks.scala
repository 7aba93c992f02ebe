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
  *     range-partition on the total order, cumsum within partitions,
  *     add broadcast per-partition offsets. Output values are exactly
  *     those of `sum().over(Window.orderBy(...).rowsBetween(
  *     unboundedPreceding, currentRow))`, independent of where the
  *     range boundaries fall, because the sort key is a total order.
  *
  * PlanSpec asserts the strongest property these enable: the fixed
  * query plans contain ZERO logical Window nodes with an empty
  * partitionSpec. */
object Ranks {

  /** Dense 1..N rank over an ALREADY-SMALL frame (e.g. the k rows a
    * TakeOrderedAndProject produced) without a global window: each
    * row's rank is 1 + the number of rows whose (unique) sort key is
    * strictly smaller, counted via a broadcast nested-loop self-join.
    *
    * `df` is evaluated three times (left side, broadcast key list,
    * and the caller's downstream use) — callers localCheckpoint the
    * limited frame first so the top-k heap runs once.
    *
    * @param key a UNIQUE orderable key (use `struct(...)` for
    *            composite keys; struct comparison is lexicographic)
    * @param out output column name (LongType, values 1..N) */
  def tinyRank(df: DataFrame, key: Column, out: String): DataFrame = {
    val keyed = df.withColumn("__rk_k", key)
    val ranks = keyed.select(col("__rk_k"))
      .join(broadcast(keyed.select(col("__rk_k").as("__rk_b"))),
        col("__rk_b") < col("__rk_k"), "left")
      .groupBy(col("__rk_k"))
      .agg((count(col("__rk_b")) + 1).as(out))
    keyed.join(broadcast(ranks), "__rk_k").drop("__rk_k")
  }

  /** Distributed global running sum of `value` in the total order
    * `sortKeys` (frame UNBOUNDED PRECEDING .. CURRENT ROW): pass 1
    * range-partitions and cumsums within each partition; pass 2 adds
    * each partition's broadcast offset (the sum of all earlier
    * partitions' totals, itself computed by a P×P broadcast self-join
    * over the P-row totals frame — no window anywhere).
    *
    * The ranged frame is localCheckpointed: the cumsum pass and the
    * totals pass MUST observe the same partition boundaries (range
    * boundaries come from sampling; two independent executions could
    * legally differ), and the checkpoint also runs the scan+exchange
    * once instead of twice. At cluster scale use persist(DISK_ONLY)
    * on the (narrow — keep it keys+value only) input instead.
    *
    * `sortKeys` must be a total order (unique) — exactness of the
    * merged prefix sum depends on no key straddling a boundary tie. */
  def runningSum(df: DataFrame, sortKeys: Seq[Column], value: Column,
      out: String): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, sortKeys: _*)
      .withColumn("__ps_pid", spark_partition_id())
      .localCheckpoint()
    val totals = ranged.groupBy(col("__ps_pid")).agg(sum(value).as("__ps_t"))
    val offsets = totals
      .join(broadcast(totals.select(col("__ps_pid").as("__ps_pb"),
          col("__ps_t").as("__ps_tb"))),
        col("__ps_pb") < col("__ps_pid"), "left")
      .groupBy(col("__ps_pid"))
      .agg(coalesce(sum(col("__ps_tb")), lit(0L)).as("__ps_off"))
    val wLocal = Window.partitionBy(col("__ps_pid"))
      .orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.withColumn("__ps_loc", sum(value).over(wLocal))
      .join(broadcast(offsets), "__ps_pid")
      .withColumn(out, col("__ps_loc") + col("__ps_off"))
      .drop("__ps_pid", "__ps_loc", "__ps_off")
  }

  /** Global 1..N row rank in the total order `sortKeys` — a running
    * count. Long-typed (row_number() is int; callers cast if the
    * narrower type matters). */
  def globalRank(df: DataFrame, sortKeys: Seq[Column], out: String): DataFrame =
    runningSum(df, sortKeys, lit(1L), out)
}
