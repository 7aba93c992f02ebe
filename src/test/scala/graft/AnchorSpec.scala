package graft

import org.scalatest.funsuite.AnyFunSuite

/** Anchor-table discipline for the two-scale regression gate: the
  * BASELINE.md tables are hand-appended markdown, and Bench's parsers
  * are the only consumers — a silent format drift (or a registered
  * query that never got an anchor row) would quietly shrink the gate's
  * coverage to whatever still parses. These tests pin the contract:
  * the two parsers PARTITION the rows (the `@sf1` marker is invisible
  * to the sf0.1 parse and vice versa), and every registered query has
  * an anchor at BOTH scales (minus the declared quadratics at sf1 and
  * the historical rename residue the last-wins parse tolerates). */
class AnchorSpec extends AnyFunSuite {

  test("every registered query has an sf0.1 anchor row") {
    val t0 = Bench.baselineT0()
    assert(t0.nonEmpty, "BASELINE.md t0 table parsed empty")
    val missing = SparkEntry.queries.keySet -- t0.keySet
    assert(missing.isEmpty,
      s"registered queries without an sf0.1 anchor (append a BASELINE.md" +
        s" addendum row): ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("every registered non-quadratic query has an @sf1 anchor row") {
    val s1 = Bench.baselineSf1()
    assert(s1.nonEmpty, "BASELINE.md @sf1 table parsed empty")
    val missing =
      SparkEntry.queries.keySet -- s1.keySet -- Bench.declaredQuadratics
    assert(missing.isEmpty,
      s"registered queries without an @sf1 anchor: " +
        missing.toSeq.sorted.mkString(", "))
    // and the quadratics must NOT be anchored at sf1 — an anchor there
    // would invite the sweep to run a documented 80-100x blowup
    val quadAnchored = Bench.declaredQuadratics.intersect(s1.keySet)
    assert(quadAnchored.isEmpty,
      s"declared quadratics carry @sf1 anchors: $quadAnchored")
  }

  test("the two anchor parsers never cross-read each other's rows") {
    // values differ by roughly the scale factor; if either parser read
    // the other's rows, last-wins would collapse the two tables into
    // one and every ratio at one scale would silently use the wrong
    // denominator. Sentinel: queries with anchors at both scales must
    // show a LARGER sf1 value for the known-heavy operators (any
    // cross-read would make them equal).
    val t0 = Bench.baselineT0()
    val s1 = Bench.baselineSf1()
    // data-dominated heavies only — streaming queries are excluded:
    // their fixed micro-batch overhead can outweigh 10x data and make
    // the sf1 anchor legitimately smaller (st13 reads 3.96 vs 4.03)
    val heavies = Seq("d03_minhash_lsh", "c01b_corpus_clean_lsh",
      "m03b_media_similarity_lsh", "d12_incremental_neardup")
    heavies.foreach { q =>
      assert(t0.contains(q) && s1.contains(q), s"$q missing an anchor")
      assert(s1(q) > t0(q),
        s"$q: sf1 anchor ${s1(q)} not above sf0.1 anchor ${t0(q)} — " +
          "parser cross-read?")
    }
    // every declared quadratic must still name a real registered query
    val ghosts = Bench.declaredQuadratics -- SparkEntry.queries.keySet
    assert(ghosts.isEmpty, s"declaredQuadratics names ghosts: $ghosts")
  }
}
