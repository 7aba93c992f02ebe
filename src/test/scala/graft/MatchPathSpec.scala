package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzing for the quantified row-pattern compiler
  * ([[graft.operators.Windows.matchPathQuant]]): random event
  * sequences x random valid patterns, checked row-for-row against a
  * driver-side brute-force matcher that implements the FORCED-extent
  * semantics directly (consume the whole quantified run, then require
  * the literal). The two implementations share nothing — one is a
  * stack of window layers, the other a per-start linear walk — so
  * agreement over random inputs pins the compiler's semantics far
  * beyond the three registered fixture patterns (q80c/q80d and the
  * degeneration cases).
  *
  * Also pins the grammar edges the registered queries never reach:
  * star-FIRST patterns (matches may start anywhere inside the leading
  * run), TRAILING-run patterns (`view.click+`, standalone `late+` —
  * the fuzz generators append them at random), and the loud rejection
  * of the genuinely ambiguous shapes (bare `s*`, adjacent runs). */
class MatchPathSpec extends AnyFunSuite {
  import SparkTestSession._

  private case class Ev(user: Long, id: Long, sym: String) {
    def value: Double = ((id % 1000) * 37 % 10).toDouble
  }

  /** Brute-force reference: one (start, end) per index where the
    * expanded pattern matches under the COMMITTED rules (literal-first
    * at every decision row, first applicable run consumes its maximal
    * extent, no backtracking — MatchPattern's scaladoc). Events must
    * already be in (ts, event_id) order per user. `predOf` resolves a
    * symbol name to its row predicate (default: symbol equality),
    * mirroring matchPathQuant's symbol map. This walk shares nothing
    * with either engine implementation — not even the parser: tokens
    * are grouped here from scratch. */
  private def reference(seq: IndexedSeq[Ev], tokens: Seq[String],
      predOf: (String, Ev) => Boolean = (n, e) => e.sym == n)
      : Seq[(Long, Long)] = {
    val expanded = tokens.flatMap { t =>
      if (t.endsWith("+")) Seq(t.dropRight(1), t.dropRight(1) + "*")
      else Seq(t)
    }
    // the maximal star suffix is the trailing chain (no anchor
    // literal: the match ends at the chain's last consumed row, the
    // previous literal if every run is empty)
    val nTail = expanded.reverse.takeWhile(_.endsWith("*")).size
    val (body, tailTok) = expanded.splitAt(expanded.size - nTail)
    val tails = tailTok.map(_.dropRight(1))
    // group into (star-chain, literal) units
    val units = {
      val b = Seq.newBuilder[(List[String], String)]
      var stars = List.empty[String]
      for (t <- body) {
        if (t.endsWith("*")) stars = stars :+ t.dropRight(1)
        else { b += ((stars, t)); stars = Nil }
      }
      b.result()
    }
    seq.indices.flatMap { start =>
      var p = start
      var ok = true
      var endId = -1L
      units.foreach { case (stars, lit) =>
        if (ok) {
          var rem = stars
          var matched = false
          while (ok && !matched) {
            if (p < seq.size && predOf(lit, seq(p))) {
              endId = seq(p).id; p += 1; matched = true
            } else {
              val i = rem.indexWhere(s => p < seq.size && predOf(s, seq(p)))
              if (i < 0) ok = false
              else {
                val s = rem(i); rem = rem.drop(i + 1)
                while (p < seq.size && predOf(s, seq(p))) p += 1
              }
            }
          }
        }
      }
      // trailing chain: greedily consume in order; every consumed row
      // advances the end (an all-empty chain keeps the literal's end)
      if (ok) tails.foreach { s =>
        while (p < seq.size && predOf(s, seq(p))) { endId = seq(p).id; p += 1 }
      }
      if (ok) Some((seq(start).id, endId)) else None
    }
  }

  test("PROPERTY: matchPathQuant == brute-force matcher on random input") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val syms = Seq("a", "b", "c")
    // generate patterns in unit form, valid BY CONSTRUCTION: each
    // element is a bare literal, one or two runs + their literal
    // anchor (all symbols distinct per the vacuity rules); elements
    // always end in a literal so the optional trailing chain appends
    // cleanly
    val genElem: Gen[Seq[String]] = for {
      s <- Gen.oneOf(syms)
      l <- Gen.oneOf(syms.filterNot(_ == s))
      s2 = syms.filterNot(x => x == s || x == l).head
      e <- Gen.frequency(
        3 -> Gen.const(Seq(s)),
        2 -> Gen.const(Seq(s + "*", l)),
        2 -> Gen.const(Seq(s + "+", l)),
        2 -> Gen.const(Seq(s + "*", s2 + "*", l)),
        1 -> Gen.const(Seq(s + "+", s2 + "*", l)))
    } yield e
    // every element ends in a literal, so a TRAILING chain (one or two
    // runs) can always be appended
    val genTail: Gen[Seq[String]] = Gen.frequency(
      3 -> Gen.const(Seq.empty[String]),
      1 -> Gen.oneOf(syms).flatMap(s =>
        Gen.oneOf(Seq(s + "*"), Seq(s + "+"))),
      1 -> (for {
        s <- Gen.oneOf(syms)
        t <- Gen.oneOf(syms.filterNot(_ == s))
      } yield Seq(s + "+", t + "*")))
    val genPattern = for {
      n <- Gen.choose(1, 3)
      es <- Gen.listOfN(n, genElem)
      t <- genTail
    } yield es.flatten ++ t
    val genEvents = for {
      nUsers <- Gen.choose(1, 3)
      evs <- Gen.listOfN(nUsers,
        Gen.choose(2, 12).flatMap(
          Gen.listOfN(_, Gen.oneOf(syms :+ "x"))))
    } yield evs
    val prop = Prop.forAllNoShrink(genEvents, genPattern) { (evs, pat) =>
      val rows = evs.zipWithIndex.flatMap { case (es, u) =>
        es.zipWithIndex.map { case (sym, i) =>
          Ev(u.toLong, (u * 1000 + i).toLong, sym)
        }
      }
      val df = rows
        .map(e => (e.user, e.id,
          // duplicate ts for every id pair: the (ts, event_id)
          // tie-break must carry the order, not ts alone
          new java.sql.Timestamp(86400000L + (e.id / 2) * 1000), e.sym))
        .toDF("user_id", "event_id", "ts", "event_type")
      val got = operators.Windows.matchPathQuant(df, pat)
        .select("user_id", "start_event", "end_event")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = rows.groupBy(_.user).flatMap { case (u, es) =>
        reference(es.sortBy(_.id).toIndexedSeq, pat)
          .map { case (s, e) => (u, s, e) }
      }.toSet
      if (got != want) {
        println(s"MISMATCH pattern=${pat.mkString(".")} events=" +
          evs.map(_.mkString).mkString("|") +
          s"\n  got=$got\n  want=$want")
      }
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("PROPERTY: predicate symbols == brute-force matcher") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit => slit}
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val syms = Seq("a", "b", "c")
    val genElem: Gen[Seq[String]] = for {
      s <- Gen.oneOf(syms)
      l <- Gen.oneOf(syms.filterNot(_ == s))
      s2 = syms.filterNot(x => x == s || x == l).head
      e <- Gen.frequency(
        3 -> Gen.const(Seq(s)),
        2 -> Gen.const(Seq(s + "*", l)),
        1 -> Gen.const(Seq(s + "+", l)),
        1 -> Gen.const(Seq(s + "*", s2 + "*", l)))
    } yield e
    val genTail: Gen[Seq[String]] = Gen.frequency(
      2 -> Gen.const(Seq.empty[String]),
      1 -> Gen.oneOf(syms).flatMap(s =>
        Gen.oneOf(Seq(s + "*"), Seq(s + "+"))),
      1 -> (for {
        s <- Gen.oneOf(syms)
        t <- Gen.oneOf(syms.filterNot(_ == s))
      } yield Seq(s + "+", t + "*")))
    val genPattern = for {
      n <- Gen.choose(1, 3)
      es <- Gen.listOfN(n, genElem)
      t <- genTail
    } yield es.flatten ++ t
    val genEvents = for {
      nUsers <- Gen.choose(1, 2)
      evs <- Gen.listOfN(nUsers,
        Gen.choose(2, 12).flatMap(
          Gen.listOfN(_, Gen.oneOf(syms :+ "x"))))
    } yield evs
    // per-symbol value thresholds: a symbol with a threshold matches
    // (sym == name && value >= t); value = (id%1000)*37 % 10 is a
    // deterministic pseudo-random digit, so thresholds slice runs
    // unpredictably (a row of the run's OWN symbol that fails the
    // value gate becomes a run BREAKER). Overlapping run/anchor
    // predicates are pinned by the dedicated unit test.
    val genThresholds = Gen.mapOf(Gen.zip(Gen.oneOf(syms),
      Gen.choose(0, 9).map(_.toDouble)))
    val prop = Prop.forAllNoShrink(genEvents, genPattern, genThresholds) {
      (evs, pat, thAll) =>
        // definitions must reference pattern symbols (the typo guard
        // rejects unused ones — by design)
        val patSyms = pat.map(_.stripSuffix("*").stripSuffix("+")).toSet
        val th = thAll.filter { case (s, _) => patSyms.contains(s) }
        val rows = evs.zipWithIndex.flatMap { case (es, u) =>
          es.zipWithIndex.map { case (sym, i) =>
            Ev(u.toLong, (u * 1000 + i).toLong, sym)
          }
        }
        val df = rows
          .map(e => (e.user, e.id,
            new java.sql.Timestamp(86400000L + (e.id / 2) * 1000),
            e.sym, e.value))
          .toDF("user_id", "event_id", "ts", "event_type", "value")
        val symbols = th.map { case (s, t) =>
          s -> (col("event_type") === s && col("value") >= slit(t))
        }
        val got = operators.Windows.matchPathQuant(df, pat, symbols)
          .select("user_id", "start_event", "end_event")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
        def predOf(name: String, e: Ev): Boolean = th.get(name) match {
          case Some(t) => e.sym == name && e.value >= t
          case None => e.sym == name
        }
        val want = rows.groupBy(_.user).flatMap { case (u, es) =>
          reference(es.sortBy(_.id).toIndexedSeq, pat, predOf)
            .map { case (s, e) => (u, s, e) }
        }.toSet
        if (got != want) {
          println(s"MISMATCH pattern=${pat.mkString(".")} th=$th events=" +
            evs.map(_.mkString).mkString("|") +
            s"\n  got=$got\n  want=$want")
        }
        got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("star-first pattern: matches start anywhere inside the leading run") {
    import spark.implicits._
    // a a b  with pattern a*.b: starts at BOTH a's and at b itself
    val df = Seq(
      (1L, 1L, new java.sql.Timestamp(1000), "a"),
      (1L, 2L, new java.sql.Timestamp(2000), "a"),
      (1L, 3L, new java.sql.Timestamp(3000), "b"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = operators.Windows.matchPathQuant(df, Seq("a*", "b"))
      .select("start_event", "end_event")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (2L, 3L), (3L, 3L)))
  }

  test("predicate symbols: value gate + greedy overlap semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(
      (1L, 1L, new java.sql.Timestamp(1000), "view", 50.0),
      (1L, 2L, new java.sql.Timestamp(2000), "click", 1.0),
      (1L, 3L, new java.sql.Timestamp(3000), "purchase", 9.0),
      (1L, 4L, new java.sql.Timestamp(4000), "view", 5.0),
      (1L, 5L, new java.sql.Timestamp(5000), "purchase", 9.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    // bigv = view with value >= 30: event 1 qualifies, event 4 does not
    val got = operators.Windows.matchPathQuant(df,
      Seq("bigv", "click*", "purchase"),
      Map("bigv" -> (col("event_type") === "view" &&
        col("value") >= lit(30.0))))
      .select("start_event", "end_event")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L)))
    // overlapping run/anchor predicates: the run greedily consumes a
    // row satisfying both, so the anchor can only match a ZERO-length
    // run — for (a a b) with run = {a, b}, anchor = {b}, the sole
    // match starts AT the b; the a-rows' runs swallow the b and die
    val ab = Seq(
      (1L, 1L, new java.sql.Timestamp(1000), "a", 0.0),
      (1L, 2L, new java.sql.Timestamp(2000), "a", 0.0),
      (1L, 3L, new java.sql.Timestamp(3000), "b", 0.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val overlap = operators.Windows.matchPathQuant(ab,
      Seq("run*", "anchor"),
      Map("run" -> col("event_type").isin("a", "b"),
        "anchor" -> (col("event_type") === "b")))
      .select("start_event", "end_event")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(overlap == Set((3L, 3L)))
  }

  test("trailing quantifiers: run end anchors the match") {
    import spark.implicits._
    // view click click purchase  with view.click+: one match, from the
    // view to the LAST click of the maximal run
    val df = Seq(
      (1L, 1L, new java.sql.Timestamp(1000), "view"),
      (1L, 2L, new java.sql.Timestamp(2000), "click"),
      (1L, 3L, new java.sql.Timestamp(3000), "click"),
      (1L, 4L, new java.sql.Timestamp(4000), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    def run(pat: Seq[String]) =
      operators.Windows.matchPathQuant(df, pat)
        .select("start_event", "end_event")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(Seq("view", "click+")) == Set((1L, 3L)))
    // trailing ZERO-or-more: a run-less view matches ending at itself
    // (the purchase row has no following clicks)
    assert(run(Seq("purchase", "click*")) == Set((4L, 4L)))
    // standalone run `click+`: one match per run row, each ending at
    // the run's last row (every row can start a path)
    assert(run(Seq("click+")) == Set((2L, 3L), (3L, 3L)))
    // run reaching the PARTITION END still terminates (null lead)
    assert(run(Seq("purchase+")) == Set((4L, 4L)))
  }

  test("vacuous quantifier shapes are rejected loudly") {
    import spark.implicits._
    val df = Seq((1L, 1L, new java.sql.Timestamp(1000), "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    // bare all-quantified patterns: they match the empty path at
    // every row (adjacent or not)
    for (bad <- Seq(Seq("a*"), Seq("a*", "b*"))) {
      val ex = intercept[IllegalArgumentException] {
        operators.Windows.matchPathQuant(df, bad)
      }
      assert(ex.getMessage.contains("bare zero-or-more"),
        s"${bad.mkString(".")}: ${ex.getMessage}")
    }
    // a run the literal-first commitment or its predecessor run
    // STARVES can never consume a row — a typo, rejected with the
    // caller's own pattern text
    for (bad <- Seq(Seq("a*", "a"), Seq("a+", "a"), Seq("a*", "a*", "b"),
        Seq("b", "a+", "a*"), Seq("a*", "b*", "a"))) {
      val ex = intercept[IllegalArgumentException] {
        operators.Windows.matchPathQuant(df, bad)
      }
      assert(ex.getMessage.contains("star symbol must differ") &&
        ex.getMessage.contains(bad.mkString(".")),
        s"${bad.mkString(".")}: ${ex.getMessage}")
    }
  }

  test("ADJACENT quantified runs: committed forced-extent chains") {
    import spark.implicits._
    // a a b b c — the advisor's shapes, previously rejected
    val df = Seq("a", "a", "b", "b", "c").zipWithIndex.map {
      case (s, i) =>
        (1L, i.toLong, new java.sql.Timestamp(1000L * (i + 1)), s)
    }.toDF("user_id", "event_id", "ts", "event_type")
    def run(pat: Seq[String]) =
      operators.Windows.matchPathQuant(df, pat)
        .select("start_event", "end_event")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a*.b*.c: both runs consume greedily, every row can start (the
    // c row itself starts a zero-length chain)
    assert(run(Seq("a*", "b*", "c")) ==
      Set((0L, 4L), (1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L)))
    // a+.b*: trailing chain — one mandatory a, then maximal a-run,
    // then maximal b-run; the match ends at the LAST b (never reaches
    // the c, which breaks the chain)
    assert(run(Seq("a+", "b*")) == Set((0L, 3L), (1L, 3L)))
    // c*.a+.b*: a leading run that is EMPTY at the match start still
    // lets the chain match (committed fall-through to the next run)
    assert(run(Seq("c*", "a+", "b*")) == Set((0L, 3L), (1L, 3L)))
    // skipped runs stay skipped (no backtracking): b*.a*.c on a-rows
    // consumes the a-run FIRST (b empty), then needs c at the first
    // b — fails; only the c row itself matches
    assert(run(Seq("b*", "a*", "c")) == Set((2L, 4L), (3L, 4L), (4L, 4L)))
  }

  test("a NULL event_type row stops a star run (not skipped)") {
    import spark.implicits._
    // view, NULL, purchase with view.click*.purchase: the NULL row is
    // not a click, so the run stops there; it is not a purchase, so
    // there is NO match. A non-coalesced default predicate would make
    // the probe's IGNORE NULLS skip the row and wrongly emit a match.
    val df = Seq(
      (1L, 1L, new java.sql.Timestamp(1000), Some("view")),
      (1L, 2L, new java.sql.Timestamp(2000), None),
      (1L, 3L, new java.sql.Timestamp(3000), Some("purchase")))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = operators.Windows.matchPathQuant(df,
      Seq("view", "click*", "purchase")).collect()
    assert(got.isEmpty)
  }

  test("an anchor row with event_id = -1 still matches (no sentinel clash)") {
    import spark.implicits._
    // -1 is a legal event id in arbitrary TVF input; the probe's
    // verdict travels as a boolean flag, not an in-band -1 sentinel
    val df = Seq(
      (1L, 1L, new java.sql.Timestamp(1000), "view"),
      (1L, 2L, new java.sql.Timestamp(2000), "click"),
      (1L, -1L, new java.sql.Timestamp(3000), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = operators.Windows.matchPathQuant(df,
      Seq("view", "click*", "purchase"))
      .select("start_event", "end_event")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, -1L)))
  }

  test("TVF: malformed symbol definition ('=' for ':=') is rejected") {
    import SparkTestSession._
    register()
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM matchpath('events', 'bigv', 'purchase', " +
        "'bigv = value >= 30')").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("is not a pattern token")),
      s"wrong failure: ${messages(ex).mkString(" | ")}")
  }

  test("unused symbol definition (typo) is rejected loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, 1L, new java.sql.Timestamp(1000), "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val ex = intercept[IllegalArgumentException] {
      operators.Windows.matchPathQuant(df, Seq("bigv", "purchase"),
        Map("bgv" -> (col("event_type") === "view"))) // typo'd name
    }
    assert(ex.getMessage.contains("not used by any pattern token"))
  }
}
