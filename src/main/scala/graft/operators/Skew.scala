package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §4.1 `SkewJoinOptimizer` /
  * §7.4 100 TB discipline). AQE's `OptimizeSkewedJoin` handles
  * runtime-detected skew in sort-merge joins automatically; these
  * helpers cover the cases AQE can't:
  *
  *   - [[saltedAggregate]]: two-phase aggregation for hot GROUP BY keys
  *     (a single hot key saturates one reducer even after AQE splits —
  *     salting fans the key across `salts` partial groups first).
  *   - [[saltedJoin]]: hot-key equi-join by replicating the small side
  *     per salt. Works for inner joins where the skewed side's hot keys
  *     can't be isolated in advance.
  *
  * Both are pure DataFrame rewrites — deterministic results, no driver
  * state, shuffle volume unchanged (only its distribution). */
object Skew {

  /** Content-derived salt (NOT rand()): deterministic under task retry
    * and speculative execution. */
  private def salt(c: Column, salts: Int): Column =
    pmod(xxhash64(c), lit(salts.toLong)).cast("int")

  /** Two-phase (salted) sum/count aggregation:
    * groupBy(key, salt) partial → groupBy(key) final. The salt hashes
    * the value column, spreading a hot key's distinct values across
    * `salts` partial groups deterministically. */
  def saltedAggregate(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.withColumn("_salt", salt(col(valueCol), salts))
      .groupBy(col(key), $"_salt")
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum($"_psum").as(s"sum_$valueCol"),
        sum($"_pcnt").cast("long").as("n"))
  }

  /** Salted inner equi-join: the skewed (big) side gets a per-row salt;
    * the small side is replicated once per salt value. The row-id salt
    * is retry-safe here because each big row joins exactly the one
    * replica carrying its salt — the result SET is assignment-independent. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int = 8): DataFrame = {
    val s = big.sparkSession
    import s.implicits._
    val saltedBig = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall,
      saltedBig(bigKey) === replicatedSmall(smallKey) &&
        saltedBig("_salt") === replicatedSmall("_salt"))
      .drop("_salt")
  }
}
