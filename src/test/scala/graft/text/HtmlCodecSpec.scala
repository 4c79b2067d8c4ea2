package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Byte-identity contract of SURVEY.md §7.3 / BASELINE.json input_hint:
  * extract(generate(url, text)) == text, byte-for-byte, for every url.
  */
class HtmlCodecSpec extends AnyFunSuite {

  test("round-trip: plain text") {
    val t = "the fast key order sort table scan merge"
    assert(HtmlCodec.extract(HtmlCodec.generate("https://example.org/a", t)) == t)
  }

  test("round-trip: text with markup-significant characters") {
    val t = "a < b && b > c \"quoted\" & 'single' <tag> &amp; literal"
    assert(HtmlCodec.extract(HtmlCodec.generate("https://example.org/b", t)) == t)
  }

  test("round-trip: empty text") {
    assert(HtmlCodec.extract(HtmlCodec.generate("https://example.org/c", "")) == "")
  }

  test("round-trip: unicode") {
    val t = "dlúthghrúpa réaltraí — 北京 — Ωμέγα ;@#$%^&*()"
    assert(HtmlCodec.extract(HtmlCodec.generate("https://example.org/d", t)) == t)
  }

  test("different urls give different html for same text (seeded layout)") {
    val t = "same text" * 20
    val h1 = new String(HtmlCodec.generate("https://example.org/x1", t), "UTF-8")
    val h2 = new String(HtmlCodec.generate("https://example.org/x2", t), "UTF-8")
    assert(h1 != h2)
  }

  test("generation is deterministic per url") {
    val t = "det check"
    val a = HtmlCodec.generate("u", t)
    val b = HtmlCodec.generate("u", t)
    assert(java.util.Arrays.equals(a, b))
  }

  test("title/script/style/comment content never leaks into extraction") {
    val html = ("<html><head><title>TITLE</title><style>p{}</style></head>" +
      "<body><script>var x=1;</script><p>keep</p><!-- drop --><p> this</p>" +
      "<script>drop()</script></body></html>").getBytes("UTF-8")
    assert(HtmlCodec.extract(html) == "keep this")
  }

  test("property: round-trip holds for 500 seeded-random texts and urls") {
    val rng = new scala.util.Random(42)
    val alphabet = "abcXYZ 0189 <>&\"'.,;:\n\téü北".toCharArray
    (0 until 500).foreach { k =>
      val text = Array.fill(rng.nextInt(300))(alphabet(rng.nextInt(alphabet.length))).mkString
      val url = s"https://example.org/src${k % 7}/doc$k"
      assert(HtmlCodec.extract(HtmlCodec.generate(url, text)) == text,
        s"round-trip failed for url=$url")
    }
  }
}
