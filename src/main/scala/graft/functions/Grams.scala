package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared n-gram/shingle construction with the computed token array
  * bound to a LAMBDA VARIABLE.
  *
  * Why this exists: writing `transform(seq, i => f(element_at(t, i)))`
  * where `t` is itself a computed column (`split(text, " ")`) lets
  * Catalyst inline `t`'s definition into EVERY element_at reference —
  * an n-gram builder then re-splits the whole document once per
  * position per referenced offset: O(n·L²) work dressed up as O(n·L).
  * Measured on the 5-gram builder at sf0.1 this is a 17× slowdown
  * (7.6 s → 0.44 s). Wrapping the array as the input of an outer
  * one-element `transform` makes it a lambda variable, which alias
  * inlining cannot rewrite — the array is computed exactly once per
  * row, with no extra shuffle (the window-function alternative costs
  * a full sort shuffle of every token and measured 5× slower). */
object Grams {

  /** Evaluate `f` over `arr` with `arr` computed exactly once per row
    * (bound as a lambda variable, immune to projection inlining). */
  def bindArray(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), a => f(a)), 1)

  /** Space-joined word n-grams of a token array, positional (not
    * distinct), empty for docs shorter than n tokens. The short-doc
    * guard is load-bearing: Spark's `sequence(1, 0)` is DESCENDING
    * ([1, 0]), not empty like SQL `range(1, 0)` — without the guard a
    * sub-n-token document fabricates wrap-around grams. */
  def wordGrams(tokens: Column, n: Int): Column =
    bindArray(tokens) { t =>
      when(size(t) >= n,
        transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k)): _*)))
        .otherwise(array().cast("array<string>"))
    }
}
