package graft.text

import org.scalatest.funsuite.AnyFunSuite

class AhoCorasickSpec extends AnyFunSuite {

  test("finds all occurrences of multiple patterns") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    val ms = ac.scan("ushers", wordBounds = false)
    assert(ms.map(m => (m.pattern, m.begin)).toSet == Set(("she", 1), ("he", 2), ("hers", 2)))
  }

  test("overlapping and repeated matches") {
    val ac = AhoCorasick.build(Seq("aa"))
    val ms = ac.scan("aaaa", wordBounds = false)
    assert(ms.map(_.begin) == List(0, 1, 2))
  }

  test("word-boundary mode only matches whole tokens") {
    val ac = AhoCorasick.build(Seq("scan", "hash join"))
    val ms = ac.scan("scan scanner hash join rescan", wordBounds = true)
    assert(ms.map(m => (m.pattern, m.begin)).toSet == Set(("scan", 0), ("hash join", 13)))
  }

  test("empty dictionary and empty text") {
    assert(AhoCorasick.build(Nil).scan("anything", wordBounds = false).isEmpty)
    assert(AhoCorasick.build(Seq("x")).scan("", wordBounds = false).isEmpty)
  }

  test("matches equal brute-force substring search on a corpus sample") {
    val dict = Seq("spark", "merge", "hash", "join", "hash join", "a")
    val text = "spark group query hash join merge a hash a spark"
    val ac = AhoCorasick.build(dict)
    val got = ac.scan(text, wordBounds = false).map(m => (m.pattern, m.begin)).toSet
    val want = (for {
      p <- dict
      i <- 0 to text.length - p.length
      if text.startsWith(p, i)
    } yield (p, i)).toSet
    assert(got == want)
  }
}
