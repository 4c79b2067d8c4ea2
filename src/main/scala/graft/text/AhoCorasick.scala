package graft.text

import scala.collection.mutable

/** Classic Aho-Corasick multi-pattern matcher over a broadcast dictionary —
  * the batched replacement for the reference's one-HTTP-call-per-entity label
  * resolution (/root/reference/src/wikidata_update/get_updates.py:883-916
  * resolves one surface at a time from markup; we scan every surface of the
  * whole dictionary in one pass per page).
  *
  * Built once on the driver, serialized into a Broadcast, shared read-only by
  * all executor threads (the arrays are immutable after build). Matching is
  * O(textLength + matches), independent of dictionary size.
  */
final class AhoCorasick private (
    val goto_ : Array[mutable.Map[Char, Int]],
    val fail: Array[Int],
    val out: Array[List[Int]],
    val patterns: Array[String]
) extends Serializable {

  final case class Match(begin: Int, end: Int, pattern: String)

  /** All occurrences; `wordBounds` restricts to matches whose neighbors are
    * non-letter/digit (token-boundary semantics for mention detection).
    */
  def scan(text: String, wordBounds: Boolean): List[Match] = {
    val res = mutable.ListBuffer[Match]()
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      var s = state
      while (s != 0 && !goto_(s).contains(c)) s = fail(s)
      state = goto_(s).getOrElse(c, 0)
      var o = state
      // `out` already folds in suffix outputs via fail-link closure at build
      out(o).foreach { pidx =>
        val pat = patterns(pidx)
        val begin = i - pat.length + 1
        val okLeft = begin == 0 || !text.charAt(begin - 1).isLetterOrDigit
        val okRight = i == text.length - 1 || !text.charAt(i + 1).isLetterOrDigit
        if (!wordBounds || (okLeft && okRight)) res += Match(begin, i + 1, pat)
      }
      i += 1
    }
    res.toList
  }
}

object AhoCorasick {
  def build(patterns: Seq[String]): AhoCorasick = {
    val pats = patterns.distinct.filter(_.nonEmpty).toArray
    val goto_ = mutable.ArrayBuffer(mutable.Map[Char, Int]())
    val outB = mutable.ArrayBuffer[List[Int]](Nil)
    // trie
    pats.zipWithIndex.foreach { case (p, pi) =>
      var state = 0
      p.foreach { c =>
        goto_(state).get(c) match {
          case Some(next) => state = next
          case None =>
            goto_ += mutable.Map[Char, Int]()
            outB += Nil
            goto_(state)(c) = goto_.length - 1
            state = goto_.length - 1
        }
      }
      outB(state) = pi :: outB(state)
    }
    // BFS failure links with output closure
    val fail = Array.fill(goto_.length)(0)
    val queue = mutable.Queue[Int]()
    goto_(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto_(r).foreach { case (c, u) =>
        queue.enqueue(u)
        var s = fail(r)
        while (s != 0 && !goto_(s).contains(c)) s = fail(s)
        fail(u) = if (goto_(s).contains(c) && goto_(s)(c) != u) goto_(s)(c) else 0
        outB(u) = outB(u) ++ outB(fail(u))
      }
    }
    new AhoCorasick(goto_.toArray, fail, outB.toArray, pats)
  }
}
