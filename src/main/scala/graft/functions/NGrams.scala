package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** `ngrams` / `context_ngrams` (reference: GenericUDAFnGrams /
  * GenericUDAFContextNGrams — SURVEY.md Appendix A GAP rows), as typed
  * [[Aggregator]]s.
  *
  * Deviation (documented): the reference estimates frequencies with a
  * pruned heap when the 'precision factor' is small; this implementation
  * counts exactly and keeps the top 2·k entries per partial buffer
  * (pruning only above that), which is deterministic and
  * merge-associative. Buffers are bounded (≤ 2·k entries survive a
  * partial), so the aggregate is spill-safe at 100 TB group counts.
  *
  * Result: array of structs (ngram: array<string>, estfrequency: double),
  * ordered by frequency desc then ngram asc — the reference's output
  * shape.
  */
object NGrams {

  type Buf = scala.collection.mutable.HashMap[Seq[String], Long]

  final case class NGramFreq(ngram: Seq[String], estfrequency: Double)

  /** Keep at most 2·k entries per partial buffer: bounded-memory,
    * spill-safe partials. Mutates in place (Aggregator contract allows
    * buffer mutation — no per-gram map copying). */
  private def prune(b: Buf, k: Int): Buf = {
    if (b.size > 4 * math.max(k, 1)) {
      val keep = b.toSeq.sortBy { case (g, c) => (-c, g.mkString(" ")) }
        .take(2 * k)
      b.clear()
      b ++= keep
    }
    b
  }

  private def top(b: Buf, k: Int): Seq[NGramFreq] =
    b.toSeq.sortBy { case (g, c) => (-c, g.mkString(" ")) }
      .take(k)
      .map { case (g, c) => NGramFreq(g, c.toDouble) }

  /** ngrams(tokens, n, k): top-k n-grams of each group's token arrays. */
  class NGramsAgg extends Aggregator[(Seq[String], Int, Int), (Buf, Int), Seq[NGramFreq]] {
    override def zero: (Buf, Int) = (new Buf, -1) // -1 = k unset
    override def reduce(b: (Buf, Int), in: (Seq[String], Int, Int)): (Buf, Int) = {
      val (tokens, n, k) = in
      if (tokens == null || tokens.size < n) (b._1, k)
      else {
        val m = b._1
        tokens.sliding(n).filter(_.size == n).foreach { g =>
          m.update(g, m.getOrElse(g, 0L) + 1L)
        }
        (prune(m, k), k)
      }
    }
    override def merge(a: (Buf, Int), b: (Buf, Int)): (Buf, Int) = {
      val m = a._1
      b._1.foreach { case (g, c) => m.update(g, m.getOrElse(g, 0L) + c) }
      val k = math.max(a._2, b._2)
      (prune(m, k), k)
    }
    override def finish(r: (Buf, Int)): Seq[NGramFreq] =
      top(r._1, if (r._2 > 0) r._2 else 10)
    override def bufferEncoder: Encoder[(Buf, Int)] =
      Encoders.tuple(Encoders.kryo[Buf], Encoders.scalaInt)
    override def outputEncoder: Encoder[Seq[NGramFreq]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** context_ngrams(tokens, context, k): the context array fixes literal
    * positions; null slots are the wildcards being counted. */
  class ContextNGramsAgg
      extends Aggregator[(Seq[String], Seq[String], Int), (Buf, Int), Seq[NGramFreq]] {
    override def zero: (Buf, Int) = (new Buf, -1) // -1 = k unset
    override def reduce(b: (Buf, Int), in: (Seq[String], Seq[String], Int)): (Buf, Int) = {
      val (tokens, context, k) = in
      if (tokens == null || context == null || tokens.size < context.size)
        (b._1, k)
      else {
        val n = context.size
        val m = b._1
        tokens.sliding(n).filter(_.size == n).foreach { win =>
          val ok = win.zip(context).forall { case (tok, ctx) =>
            ctx == null || ctx == tok
          }
          if (ok) {
            val g = win.zip(context).collect { case (tok, null) => tok }
            m.update(g, m.getOrElse(g, 0L) + 1L)
          }
        }
        (prune(m, k), k)
      }
    }
    override def merge(a: (Buf, Int), b: (Buf, Int)): (Buf, Int) = {
      val m = a._1
      b._1.foreach { case (g, c) => m.update(g, m.getOrElse(g, 0L) + c) }
      val k = math.max(a._2, b._2)
      (prune(m, k), k)
    }
    override def finish(r: (Buf, Int)): Seq[NGramFreq] =
      top(r._1, if (r._2 > 0) r._2 else 10)
    override def bufferEncoder: Encoder[(Buf, Int)] =
      Encoders.tuple(Encoders.kryo[Buf], Encoders.scalaInt)
    override def outputEncoder: Encoder[Seq[NGramFreq]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("ngrams", udaf(new NGramsAgg))
    spark.udf.register("context_ngrams", udaf(new ContextNGramsAgg))
  }
}
