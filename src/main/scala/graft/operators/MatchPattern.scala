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
  * Grammar (`(sym | sym* | sym+)+`): `s+` rewrites to `s.s*`; the
  * pattern may END in one quantified run (the trailing-run form,
  * q80f); elsewhere every run must be anchored by a following literal,
  * and no two quantified runs may be adjacent — the determinism
  * constraints of the reference resolver's forced-extent chain
  * semantics. A bare `s*` matches the empty path at every row and is
  * rejected (use `s+`).
  *
  * Error messages name the pattern THE CALLER WROTE
  * (`rawTokens.mkString(".")`), not the post-expansion token list —
  * `a+.b*` is reported as itself with a note that `a+` expands to
  * `a.a*`, never as the baffling "adjacent stars in a.a*.b*". */
private[graft] object MatchPattern {

  /** One compiled unit: an optional leading star run, then its literal
    * anchor. */
  final case class PUnit(star: Option[String], sym: String)

  /** Parsed pattern: anchored units in order, plus the optional
    * trailing run symbol (match end = last row of its maximal run). */
  final case class Compiled(units: IndexedSeq[PUnit], tail: Option[String]) {
    /** Every symbol any token refers to (for unused-definition checks). */
    def symbolsUsed: Set[String] =
      (units.flatMap(_.star) ++ units.map(_.sym) ++ tail).toSet
  }

  /** Parse and validate `rawTokens`. Fails loudly (with the caller's
    * own pattern text) on the grammar's rejected shapes. */
  def compile(rawTokens: Seq[String]): Compiled = {
    val raw = rawTokens.mkString(".")
    // one-or-more: s+ == s.s* (one literal anchor, then a star run)
    val tokens = rawTokens.flatMap { t =>
      if (t.endsWith("+")) Seq(t.dropRight(1), t.dropRight(1) + "*")
      else Seq(t)
    }
    require(tokens.nonEmpty, "empty symbol pattern")
    def adjacent(detail: String): String =
      s"adjacent star quantifiers unsupported in '$raw'$detail" +
        " (note sym+ expands to sym.sym*)"
    // a TRAILING run (q80f: `view.click+`, standalone `late+`) splits
    // off before unit grouping: its end anchor is the run's own last
    // row, not a following literal
    val (bodyTokens, tail) =
      if (tokens.last.endsWith("*"))
        (tokens.init, Some(tokens.last.dropRight(1)))
      else (tokens, None)
    require(bodyTokens.nonEmpty,
      s"a bare zero-or-more pattern ('$raw') matches the empty path " +
        "at every row — use sym+ for one-or-more")
    require(!bodyTokens.last.endsWith("*"),
      adjacent(": the pattern may end in at most one quantified run"))
    val units = {
      val b = IndexedSeq.newBuilder[PUnit]
      var i = 0
      while (i < bodyTokens.size) {
        if (bodyTokens(i).endsWith("*")) {
          val s = bodyTokens(i).dropRight(1)
          require(!bodyTokens(i + 1).endsWith("*"), adjacent(""))
          require(s != bodyTokens(i + 1),
            s"star symbol must differ from the literal it precedes " +
              s"(in '$raw')")
          b += PUnit(Some(s), bodyTokens(i + 1)); i += 2
        } else { b += PUnit(None, bodyTokens(i)); i += 1 }
      }
      b.result()
    }
    Compiled(units, tail)
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
