package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Semantics cases of extract_href (get_updates.py:883-916). */
class HrefExtractSpec extends AnyFunSuite {

  test("Property href wins") {
    assert(HrefExtract.extractFragment(
      """<td><a href="/wiki/Property:P569" title="Property:P569">date of birth</a></td>"""
    ) == "P569")
  }

  test("/wiki/Q href → wd: term") {
    assert(HrefExtract.extractFragment(
      """<td><a href="/wiki/Q5" title="Q5">human</a></td>"""
    ) == "wd:Q5")
  }

  test("fragment that IS an anchor") {
    assert(HrefExtract.extractFragment(
      """<a href="/wiki/Q42">Douglas Adams</a>"""
    ) == "wd:Q42")
  }

  test("title attribute fallback") {
    assert(HrefExtract.extractFragment(
      """<span title="Property:P31">instance of</span>"""
    ) == "P31")
  }

  test("P: text fallback") {
    assert(HrefExtract.extractFragment("""<span>P: P106</span>""") == "P106")
  }

  test("time-rendered b tag → quoted text") {
    assert(HrefExtract.extractFragment(
      """<td><b class="wb-time-rendered">11 March 1952</b></td>"""
    ) == "\"11 March 1952\"")
  }

  test("quantity-rendered b tag → quoted text") {
    assert(HrefExtract.extractFragment(
      """<td><b class="x wb-quantity-rendered">70 kilogram</b></td>"""
    ) == "\"70 kilogram\"")
  }

  test("handleNested: reference family emits ref-typed block with pr: pairs") {
    val out = HrefExtract.handleNested(
      Seq("""<a href="/wiki/Property:P248">stated in</a>""",
        """<a href="/wiki/Q36578">GND</a>"""),
      "prov:wasDerivedFrom", "Q42", Some("b0096c6f"))
    assert(out ==
      "  ?statement prov:wasDerivedFrom ref:b0096c6f .\n" +
        "  ref:b0096c6f a wikibase:Reference .\n" +
        "  ref:b0096c6f pr:P248 wd:Q36578 .\n")
  }

  test("handleNested: qualifier family binds to ?statement with pq:") {
    val out = HrefExtract.handleNested(
      Seq("""<a href="/wiki/Property:P580">start</a>""",
        """<b class="wb-time-rendered">1 Jan 2020</b>"""),
      "qualifier", "Q42", None)
    assert(out == "  ?statement pq:P580 \"1 Jan 2020\" .\n")
  }

  test("handleNested: ps family short-circuits on the first fragment") {
    val out = HrefExtract.handleNested(
      Seq("""<a href="/wiki/Q5">human</a>""", "<span>ignored</span>"),
      "ps:P31", "Q42", None)
    assert(out == "  ?statement ps:P31 wd:Q5 .")
  }

  test("handleNested: default family emits wd-subject ps pairs; odd tail drops") {
    val out = HrefExtract.handleNested(
      Seq("""<a href="/wiki/Property:P31">instance of</a>""",
        """<a href="/wiki/Q5">human</a>""",
        "<span>odd tail</span>"),
      "other", "Q42", None)
    assert(out == "  wd:Q42 ps:P31 wd:Q5 .\n")
  }

  test("plain text → quoted with escape") {
    assert(HrefExtract.extractFragment(
      """<td>He said "hi"</td>"""
    ) == "\"He said \\\"hi\\\"\"")
  }
}
