package graft.ops

/** Aho–Corasick multi-pattern string matching: ONE pass over each text
  * finds all occurrences of ALL patterns simultaneously — the scale shape
  * a contamination/PII scanner needs (K patterns over 100 TB must not be
  * K passes, which is what per-pattern `replace`/`LIKE` costs). Classic
  * construction (goto trie + BFS failure links + output links); counts
  * every match end position, which for border-free patterns (no proper
  * prefix = suffix, so a pattern cannot overlap itself) equals the
  * non-overlapping count SQL's replace-arithmetic oracle computes —
  * that's the q344 parity contract, and AhoCorasickSpec pins it
  * property-style against the replace count.
  *
  * The automaton is built once on the driver (patterns are a bounded
  * config, not data) and ships to executors as a broadcast-sized
  * Serializable — per-task cost is O(text length + matches).
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty))

  // flat trie: per-node char→child map, failure link, matched pattern ids
  private val children = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.Map.empty[Char, Int])
  private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
  patterns.zipWithIndex.foreach { case (p, pi) =>
    var node = 0
    p.foreach { ch =>
      node = children(node).getOrElseUpdate(ch, {
        children += scala.collection.mutable.Map.empty[Char, Int]
        out += Nil
        children.size - 1
      })
    }
    out(node) = pi :: out(node)
  }
  private val fail = new Array[Int](children.size)
  locally { // BFS failure links; outputs accumulate along the links
    val queue = scala.collection.mutable.Queue[Int]()
    children(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = children(f).get(ch).filter(_ != v).getOrElse(0)
        out(v) = out(v) ++ out(fail(v))
        queue += v
      }
    }
  }
  private val childArr: Array[Map[Char, Int]] = children.map(_.toMap).toArray
  private val outArr: Array[Array[Int]] = out.map(_.toArray).toArray

  /** Per-pattern occurrence counts over one text (every match end). */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.size)
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && !childArr(node).contains(ch)) node = fail(node)
      node = childArr(node).getOrElse(ch, 0)
      val os = outArr(node)
      var j = 0
      while (j < os.length) { counts(os(j)) += 1L; j += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {
  /** q344's fixed scan set: corpus-phrase patterns, each border-free
    * (no proper prefix = suffix) so automaton occurrence counts equal
    * the oracle's non-overlapping replace arithmetic. */
  val contaminationPatterns: Seq[String] = Seq(
    "scan ", "hash v", "table k", "fast m",
    "value p", "row s", "spark", "merge b")
}
