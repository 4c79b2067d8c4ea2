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

  test("plain text → quoted with escape") {
    assert(HrefExtract.extractFragment(
      """<td>He said "hi"</td>"""
    ) == "\"He said \\\"hi\\\"\"")
  }
}
