package graft.text

import scala.collection.mutable

/** Aho-Corasick multi-pattern matcher compiled to a dense DFA — the batched
  * replacement for the reference's one-HTTP-call-per-entity label resolution
  * (/root/reference/src/wikidata_update/get_updates.py:883-916 resolves one
  * surface at a time from markup; we scan the whole dictionary per page in
  * one pass).
  *
  * Built once on the driver, shipped via Broadcast, shared read-only by all
  * executor threads. After the classic trie+failure construction, the
  * automaton is flattened to `delta: Array[Int]` (states × alphabet) with
  * failure transitions resolved away, so the hot loop is one array load per
  * character — no hash lookups, no boxing, no failure chase. Characters
  * outside the pattern alphabet map to symbol 0 which always returns to the
  * root. Matching is O(text + matches) with a ~1 ns/char constant.
  */
final class AhoCorasick private (
    private val symOf: Array[Short], // char -> symbol index (0 = not in any pattern)
    private val delta: Array[Int], // state * nSyms + sym -> state
    private val nSyms: Int,
    private val out: Array[Array[Int]], // state -> matched pattern indices (suffix-closed)
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
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      val sym = if (c < symOf.length) symOf(c) else 0
      state = delta(state * nSyms + sym)
      val hits = out(state)
      if (hits.length != 0) {
        var h = 0
        while (h < hits.length) {
          val pat = patterns(hits(h))
          val begin = i - pat.length + 1
          if (!wordBounds ||
              ((begin == 0 || !Character.isLetterOrDigit(text.charAt(begin - 1))) &&
               (i == n - 1 || !Character.isLetterOrDigit(text.charAt(i + 1)))))
            res += Match(begin, i + 1, pat)
          h += 1
        }
      }
      i += 1
    }
    res.toList
  }
}

object AhoCorasick {
  def build(patterns: Seq[String]): AhoCorasick = {
    val pats = patterns.distinct.filter(_.nonEmpty).toArray

    // alphabet: symbol 0 reserved for "not in any pattern"
    val symOf = new Array[Short](Char.MaxValue + 1)
    var nSyms = 1
    pats.foreach(_.foreach { c =>
      if (symOf(c) == 0) { symOf(c) = nSyms.toShort; nSyms += 1 }
    })

    // trie over symbols
    val trans = mutable.ArrayBuffer(new Array[Int](nSyms)) // 0 = absent (root loops handled later)
    val outB = mutable.ArrayBuffer[List[Int]](Nil)
    pats.zipWithIndex.foreach { case (p, pi) =>
      var state = 0
      p.foreach { c =>
        val s = symOf(c)
        if (trans(state)(s) == 0) {
          trans += new Array[Int](nSyms)
          outB += Nil
          trans(state)(s) = trans.length - 1
        }
        state = trans(state)(s)
      }
      outB(state) = pi :: outB(state)
    }

    // BFS: failure links + DFA completion + output closure
    val nStates = trans.length
    val fail = new Array[Int](nStates)
    val queue = mutable.Queue[Int]()
    var s = 1
    while (s < nSyms) { // depth-1 states fail to root; root's missing syms loop to root (already 0)
      val u = trans(0)(s)
      if (u != 0) queue.enqueue(u)
      s += 1
    }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      var sy = 1
      while (sy < nSyms) {
        val u = trans(r)(sy)
        if (u != 0) {
          queue.enqueue(u)
          fail(u) = trans(fail(r))(sy)
          outB(u) = outB(u) ++ outB(fail(u))
        } else {
          trans(r)(sy) = trans(fail(r))(sy) // resolve failure into the DFA
        }
        sy += 1
      }
    }

    val delta = new Array[Int](nStates * nSyms)
    var st = 0
    while (st < nStates) {
      System.arraycopy(trans(st), 0, delta, st * nSyms, nSyms)
      st += 1
    }
    new AhoCorasick(symOf, delta, nSyms, outB.map(_.toArray).toArray, pats)
  }
}
