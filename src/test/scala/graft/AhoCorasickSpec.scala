package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AhoCorasick

/** Pins q344's parity contract: for border-free patterns, AC's
  * every-match-end count equals the non-overlapping replace count the
  * SQL oracle computes — property-tested on seeded random strings over
  * the patterns' own alphabet (maximizing accidental overlap pressure),
  * plus overlap/prefix-nesting corner cases the corpus can't produce. */
class AhoCorasickSpec extends AnyFunSuite {

  private def replaceCount(text: String, p: String): Long =
    (text.length - text.replace(p, "").length).toLong / p.length

  test("q344 pattern set is border-free") {
    AhoCorasick.contaminationPatterns.foreach { p =>
      assert(!(1 until p.length).exists(k => p.take(k) == p.takeRight(k)),
        s"'$p' has a border — the replace-count oracle parity would break")
    }
  }

  test("AC counts equal replace counts on random text (seeded)") {
    val pats = AhoCorasick.contaminationPatterns
    val ac = new AhoCorasick(pats)
    val alphabet = pats.mkString.distinct
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val text = Array.fill(300)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = ac.countAll(text)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == replaceCount(text, p), s"'$p' in '$text'")
      }
    }
  }

  test("nested patterns both fire at a shared match end") {
    val ac = new AhoCorasick(Seq("ab", "aab", "b"))
    val got = ac.countAll("aaab ab")
    assert(got.toSeq == Seq(2L, 1L, 2L)) // ab@(2,5), aab@2, b@(3,6)
  }

  test("self-overlapping pattern counts every occurrence (AC semantics)") {
    // "aa" HAS a border; AC counts overlaps (3 in "aaaa"), replace counts 2.
    // This is exactly why q344's patterns must be border-free.
    val ac = new AhoCorasick(Seq("aa"))
    assert(ac.countAll("aaaa")(0) == 3L)
    assert(replaceCount("aaaa", "aa") == 2L)
  }
}
