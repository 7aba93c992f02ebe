package graft.operators

/** The row-pattern token grammar shared by the BATCH compiler
  * ([[Windows.matchPathQuant]] — windowed-expression backward folding)
  * and the STREAMING matcher
  * ([[graft.streaming.Streams.QuantFunnelProcessor]] — imperative scan
  * over each key's finalized buffer). One parser guarantees the two
  * engines accept exactly the same patterns with exactly the same
  * rejection semantics, so a funnel moved from backfill to live stream
  * can never silently change meaning. (SURVEY.md §2.4.)
  *
  * Grammar (`(sym | sym* | sym+)+`): `s+` rewrites to `s.s*`.
  * Quantified runs may be ADJACENT (`a*.b*.c`, `a+.b*`) and the
  * pattern may end in any number of trailing runs; matching is
  * COMMITTED — greedy forced extent, no backtracking: at each decision
  * row the unit's anchor literal wins if it matches (a zero-length run
  * chain), otherwise the first applicable run of the chain consumes
  * every consecutive row satisfying its predicate and the decision
  * repeats at the terminator with the runs that follow it. Trailing
  * runs consume greedily in order; the match ends at the last consumed
  * row (the final literal itself when every trailing run is empty).
  * These semantics are deterministic for every accepted pattern — each
  * start row yields at most one match.
  *
  * Rejected shapes — all VACUOUS under committed matching, so the
  * rejection is a typo guard, not a semantics constraint:
  * bare all-quantified patterns (`s*`, `a*.b*` with no literal — they
  * match the empty path at every row; use `s+` for one-or-more), and a
  * run whose NAME-symbol equals its unit's literal or the next run's
  * symbol (`a*.a`, `a*.a*.b` — the literal-first commitment or the
  * earlier run starves it, so it can never consume a row). Predicate-
  * defined symbols cannot be checked statically; overlapping
  * predicates follow the committed rules above (MatchPathSpec pins
  * them).
  *
  * Error messages name the pattern THE CALLER WROTE
  * (`rawTokens.mkString(".")`), not the post-expansion token list —
  * with a note that `a+` expands to `a.a*` where the expansion is what
  * tripped the rule. */
private[graft] object MatchPattern {

  /** One compiled unit: a (possibly empty) chain of star runs, then
    * the literal that anchors them. */
  final case class PUnit(stars: List[String], sym: String)

  /** Parsed pattern: anchored units in order, plus the trailing run
    * chain (match end = last row consumed by the chain, or the final
    * literal when the chain consumes nothing). */
  final case class Compiled(units: IndexedSeq[PUnit], tails: List[String]) {
    /** Every symbol any token refers to (for unused-definition checks). */
    def symbolsUsed: Set[String] =
      (units.flatMap(_.stars) ++ units.map(_.sym) ++ tails).toSet
  }

  /** Parse and validate `rawTokens`. Fails loudly (with the caller's
    * own pattern text) on the vacuous shapes. */
  def compile(rawTokens: Seq[String]): Compiled = {
    val raw = rawTokens.mkString(".")
    // one-or-more: s+ == s.s* (one literal anchor, then a star run)
    val tokens = rawTokens.flatMap { t =>
      if (t.endsWith("+")) Seq(t.dropRight(1), t.dropRight(1) + "*")
      else Seq(t)
    }
    require(tokens.nonEmpty, "empty symbol pattern")
    // the maximal star suffix is the trailing run chain; the body that
    // remains ends in a literal by construction
    val nTail = tokens.reverse.takeWhile(_.endsWith("*")).size
    val (bodyTokens, tailTokens) = tokens.splitAt(tokens.size - nTail)
    val tails = tailTokens.map(_.dropRight(1)).toList
    require(bodyTokens.nonEmpty,
      s"a bare zero-or-more pattern ('$raw') matches the empty path " +
        "at every row — use sym+ for one-or-more")
    val units = {
      val b = IndexedSeq.newBuilder[PUnit]
      var stars = List.newBuilder[String]
      for (t <- bodyTokens) {
        if (t.endsWith("*")) stars += t.dropRight(1)
        else { b += PUnit(stars.result(), t); stars = List.newBuilder }
      }
      b.result()
    }
    def vacuous(star: String, why: String): Nothing =
      throw new IllegalArgumentException(
        s"star symbol must differ from $why (in '$raw'; a run of " +
          s"'$star' there could never consume a row under committed " +
          "literal-first matching; note sym+ expands to sym.sym*)")
    for (u <- units) {
      for (s <- u.stars if s == u.sym)
        vacuous(s, s"its unit's anchor literal '${u.sym}'")
      for (Seq(s1, s2) <- u.stars.sliding(2) if s1 == s2)
        vacuous(s2, s"the preceding run's symbol '$s1'")
    }
    for (Seq(t1, t2) <- tails.sliding(2) if t1 == t2)
      vacuous(t2, s"the preceding run's symbol '$t1'")
    Compiled(units, tails)
  }

  /** Reject symbol definitions no token uses — a typo'd name would
    * otherwise degrade SILENTLY to event_type-equality matching. */
  def requireSymbolsUsed(c: Compiled, defined: Set[String],
      rawTokens: Seq[String]): Unit = {
    val unused = defined.diff(c.symbolsUsed)
    require(unused.isEmpty,
      s"symbol definition(s) not used by any pattern token: " +
        s"${unused.mkString(", ")} (tokens: ${rawTokens.mkString(".")})")
  }
}
