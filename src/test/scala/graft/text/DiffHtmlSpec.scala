package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.text.DiffHtml.RdfOut

/** Golden port of the convert_to_rdf walk semantics
  * (/root/reference/src/wikidata_update/get_updates.py:191-572): row routing
  * by CSS class, main-predicate extraction with sub-prop override and the
  * schema-row `_`→`-` language fix, handle_claim_updates, nested pairing,
  * wb-details stripping, process_flat quirks (camel-cased rank, the literal
  * `ll` prefix), and generate_rdf's format quirks (schema `"\n\t\t"` join,
  * property `DELETE DATA{` missing space, `?statement` substitution with the
  * minted id persisting across flushes).
  */
class DiffHtmlSpec extends AnyFunSuite {

  private val TS = "2024-01-01 00:00:00"

  private def run(html: String): Seq[RdfOut] =
    DiffHtml.convertToRdf(html, "Q42", TS, 100L, 99L)

  // ---------------------------------------------------------------- Html

  test("Html parser: tree shape, classes, text semantics") {
    val root = Html.parse(
      """<table><tr class="a b"><td class="diff-lineno">label / en</td></tr>""" +
        """<tr><td> x <b>y</b> z </td></tr></table>""")
    val trs = root.findAll(_.name == "tr")
    assert(trs.length == 2)
    assert(trs(0).hasClass("a") && trs(0).hasClass("b"))
    assert(trs(0).getTextRaw == "label / en")
    assert(trs(1).getTextRaw == " x y z ")
    assert(trs(1).getTextStripped == "xyz") // get_text(strip=True): per-node strip, no separator
  }

  test("Html parser: entities, comments, void and self-closing tags") {
    val root = Html.parse("""<div title="a &amp; b"><!-- no --><br><img src="x"/>T &lt; U</div>""")
    val div = root.find(_.name == "div").get
    assert(div.attr("title").contains("a & b"))
    assert(div.getTextRaw == "T < U")
    assert(div.findAll(_.name == "br").length == 1)
  }

  test("Html parser: numeric character references and dash-class named entities") {
    val root = Html.parse(
      """<div title="x&#160;y">A&#8217;s caf&#xE9; 1&ndash;2 em&mdash;dash &hellip; &bogus; &#zz; & plain</div>""")
    val div = root.find(_.name == "div").get
    assert(div.attr("title").contains("x\u00a0y"))
    // decimal + hex refs decode; ndash/mdash/hellip decode; malformed pass through literally
    assert(div.getTextRaw == "A’s café 1–2 em—dash … &bogus; &#zz; & plain")
  }

  // ---------------------------------------------------------- extract_href

  test("extractHref: property href, Q href, title, P: text, b-rendered, plain") {
    def frag(h: String): Html.Elem = Html.parse(h).children.head.asInstanceOf[Html.Elem]
    assert(DiffHtml.extractHref(frag("""<a href="/wiki/Property:P31">instance of</a>""")) == "P31")
    assert(DiffHtml.extractHref(frag("""<a href="/wiki/Q42">Adams</a>""")) == "wd:Q42")
    assert(DiffHtml.extractHref(frag("""<span title="Property:P569">x</span>""")) == "P569")
    assert(DiffHtml.extractHref(frag("""<span>P: P123 </span>""")) == "P123")
    assert(DiffHtml.extractHref(frag("""<span><b class="wb-time-rendered">1 May 2020</b></span>""")) ==
      "\"1 May 2020\"")
    assert(DiffHtml.extractHref(frag("""<del class="diffchange">say "hi"</del>""")) ==
      "\"say \\\"hi\\\"\"")
  }

  // -------------------------------------------------- schema label family

  test("schema label edit: language tag, aggregated text, tab-join block format") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">label / en</td></tr>
        |<tr><td class="diff-deletedline"><div><del class="diffchange">Old Name</del></div></td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange">New Name</ins></div></td></tr>
        |</table>""".stripMargin)
    assert(out == Seq(
      RdfOut("Q42", "DELETE", "DELETE DATA {\n  wd:Q42 schema:label \"Old Name\"@en .\n};", TS),
      RdfOut("Q42", "INSERT", "INSERT DATA {\n  wd:Q42 schema:label \"New Name\"@en .\n};", TS)
    ))
  }

  test("schema description: no language tag (neither name nor label)") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">description / en</td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange">a thing</ins></div></td></tr>
        |</table>""".stripMargin)
    assert(out == Seq(
      RdfOut("Q42", "INSERT", "INSERT DATA {\n  wd:Q42 schema:description \"a thing\" .\n};", TS)))
  }

  test("schema-row language underscore fix: zh_hant → @zh-hant (reference:472-476)") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">label / zh_hant</td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange">名</ins></div></td></tr>
        |</table>""".stripMargin)
    assert(out.head.rdf.contains("\"名\"@zh-hant ."))
  }

  test("two deleted cells aggregate with a space (get_text join, reference:249-250)") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">label / en</td></tr>
        |<tr><td class="diff-deletedline">Old</td><td class="diff-deletedline"><del class="diffchange">Name</del></td></tr>
        |</table>""".stripMargin)
    assert(out == Seq(
      RdfOut("Q42", "DELETE", "DELETE DATA {\n  wd:Q42 schema:label \"Old Name\"@en .\n};", TS)))
  }

  test("multi-statement schema block joins with newline+tabs (reference:525-526)") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">aliases / en</td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange">A1</ins></div></td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange">A2</ins></div></td></tr>
        |</table>""".stripMargin)
    assert(out == Seq(RdfOut("Q42", "INSERT",
      "INSERT DATA {\n  wd:Q42 schema:aliases \"A1\" .\n\t\t  wd:Q42 schema:aliases \"A2\" .\n};", TS)))
  }

  // ------------------------------------------------------- property family

  test("whole-claim add: handle_claim_updates + ?statement substitution with minted id") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P31">instance of</a></td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange"><a href="https://www.wikidata.org/wiki/Q5">human</a></ins></div></td></tr>
        |</table>""".stripMargin)
    val sid = SparqlFormat.mintStatementId("Q42", "P31", "\"human\"")
    assert(out == Seq(RdfOut("Q42", "INSERT",
      "INSERT DATA {\n" +
        s"  $sid a wikibase:Statement .\n" +
        s"  $sid a wikibase:BestRank .\n" +
        s"  wd:Q42 p:P31 $sid .\n" +
        s"  $sid psn:P31 <http://www.wikidata.org/wiki/Q5> .\n" + // https→http (reference:502)
        s"  wd:Q42 wdtn:P31 <http://www.wikidata.org/wiki/Q5> .\n" +
        s"  wd:Q42 wdt:P31 \"human\" .\n" +
        s"  $sid ps:P31 \"human\" .\n};",
      TS)))
  }

  test("whole-claim delete uses the DELETE DATA{ missing-space format (reference:559)") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P31">instance of</a></td></tr>
        |<tr><td class="diff-deletedline"><div><del class="diffchange"><a href="https://www.wikidata.org/wiki/Q5">human</a></del></div></td></tr>
        |</table>""".stripMargin)
    assert(out.length == 1 && out.head.op == "DELETE")
    assert(out.head.rdf.startsWith("DELETE DATA{\n"))
    val sid = SparqlFormat.mintStatementId("Q42", "P31", "\"human\"")
    assert(out.head.rdf.contains(s"  $sid ps:P31 \"human\" ."))
  }

  test("qualifier sub-prop: nested (a, time-b) pair → pq line, no statement id") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P39">position</a> / qualifier</td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange"><span><a href="/wiki/Property:P585">point in time</a>: <b class="wb-time-rendered">1 May 2020</b></span></ins></div></td></tr>
        |</table>""".stripMargin)
    // no ps: line anywhere → STATEMENT_ID stays unset → literal ?statement survives,
    // and handle_nested's per-pair trailing \n yields the double newline before };
    assert(out == Seq(RdfOut("Q42", "INSERT",
      "INSERT DATA {\n  ?statement pq:P585 \"1 May 2020\" .\n\n};", TS)))
  }

  test("rank change: camel-cased wikibase:rank object (reference:386-388)") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P39">position</a> / rank</td></tr>
        |<tr><td class="diff-deletedline"><div><del class="diffchange"><span>preferred rank</span></del></div></td></tr>
        |</table>""".stripMargin)
    assert(out == Seq(RdfOut("Q42", "DELETE",
      "DELETE DATA{\n  ?statement wikibase:rank wikibase:PreferredRank .\n};", TS)))
  }

  test("reference sub-prop: prov:wasDerivedFrom header + pr lines with minted ref hash") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P39">position</a> / reference</td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange"><span><a href="/wiki/Property:P248">stated in</a> <a href="/wiki/Q36578">GND</a></span></ins></div></td></tr>
        |</table>""".stripMargin)
    val h = DiffHtml.mintRefHash("Q42", 100L, "P39")
    assert(out == Seq(RdfOut("Q42", "INSERT",
      "INSERT DATA {\n" +
        s"  ?statement prov:wasDerivedFrom ref:$h .\n" +
        s"  ref:$h a wikibase:Reference .\n" +
        s"  ref:$h pr:P248 wd:Q36578 .\n\n};",
      TS)))
  }

  test("statement id persists across flushes within a document (global quirk, reference:102)") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P31">instance of</a></td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange"><a href="https://www.wikidata.org/wiki/Q5">human</a></ins></div></td></tr>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P39">position</a> / rank</td></tr>
        |<tr><td class="diff-deletedline"><div><del class="diffchange"><span>normal rank</span></del></div></td></tr>
        |</table>""".stripMargin)
    val sid = SparqlFormat.mintStatementId("Q42", "P31", "\"human\"")
    assert(out.length == 2)
    // the later rank flush minted nothing itself, but inherits the live id
    assert(out(1) == RdfOut("Q42", "DELETE",
      s"DELETE DATA{\n  $sid wikibase:rank wikibase:NormalRank .\n};", TS))
  }

  test("wb-details sub-table is stripped before nested extraction (reference:421-424)") {
    val withDetails = run(
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P39">position</a> / qualifier</td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange"><span><a href="/wiki/Property:P585">point in time</a>: <b class="wb-time-rendered">1 May 2020</b><table class="wb-details wb-time-details"><tr><td><a href="/wiki/Q1985727">gregorian</a></td></tr></table></span></ins></div></td></tr>
        |</table>""".stripMargin)
    val without = run(
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P39">position</a> / qualifier</td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange"><span><a href="/wiki/Property:P585">point in time</a>: <b class="wb-time-rendered">1 May 2020</b></span></ins></div></td></tr>
        |</table>""".stripMargin)
    assert(withDetails == without) // the details <a> must not join the nested pairing
  }

  test("noise spans (single tag, no colon) contribute nothing; only well-formed pairs survive") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P39">position</a> / reference</td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange"><span><a href="/wiki/Property:P248">stated in</a> <a href="/wiki/Q36578">GND</a></span><span><b>orphan</b></span><span><a href="/wiki/Property:P813">retrieved</a></span></ins></div></td></tr>
        |</table>""".stripMargin)
    val h = DiffHtml.mintRefHash("Q42", 100L, "P39")
    // span2 ([b], no colon) and span3 ([a], no colon) hit neither
    // aggregate_nested_elements branch (reference:404-418) → only the first
    // (a, a) pair reaches handle_nested. (The reference's odd-tail drop at
    // 273-285 is defensive dead code: every branch appends 0 or 2 tags —
    // the fragment-level drop itself is pinned in HrefExtractSpec.)
    assert(out.head.rdf.contains(s"ref:$h pr:P248 wd:Q36578 ."))
    assert(!out.head.rdf.contains("P813") && !out.head.rdf.contains("orphan"))
  }

  test("single-tag span with colon text synthesizes the object a-tag (reference:414-418)") {
    val out = run(
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P39">position</a> / qualifier</td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange"><span><a href="/wiki/Property:P1545">series ordinal</a>: 7</span></ins></div></td></tr>
        |</table>""".stripMargin)
    assert(out == Seq(RdfOut("Q42", "INSERT",
      "INSERT DATA {\n  ?statement pq:P1545 \"7\" .\n\n};", TS)))
  }

  test("empty diff yields no output; content before any lineno row is skipped") {
    assert(run("<table></table>").isEmpty)
    assert(run("""<table><tr><td class="diff-addedline"><ins class="diffchange">x</ins></td></tr></table>""").isEmpty)
  }

  test("full fixture document: 5 blocks, all families (matches q44 oracle closed form)") {
    val html = DiffHtmlGen.generate(7L, 123L)
    val out = DiffHtml.convertToRdf(html, "Q7", TS, 123L, 122L)
    val sid = SparqlFormat.mintStatementId("Q7", "P31", "\"human 123\"")
    assert(out == Seq(
      RdfOut("Q7", "DELETE", "DELETE DATA {\n  wd:Q7 schema:label \"old label 123\"@en .\n};", TS),
      RdfOut("Q7", "INSERT", "INSERT DATA {\n  wd:Q7 schema:label \"new label 123\"@en .\n};", TS),
      RdfOut("Q7", "INSERT", "INSERT DATA {\n  ?statement pq:P585 \"time 123\" .\n\n};", TS),
      RdfOut("Q7", "DELETE", "DELETE DATA{\n  ?statement wikibase:rank wikibase:NormalRank .\n};", TS),
      RdfOut("Q7", "INSERT",
        "INSERT DATA {\n" +
          s"  $sid a wikibase:Statement .\n" +
          s"  $sid a wikibase:BestRank .\n" +
          s"  wd:Q7 p:P31 $sid .\n" +
          s"  $sid psn:P31 <http://www.wikidata.org/wiki/Q5> .\n" +
          s"  wd:Q7 wdtn:P31 <http://www.wikidata.org/wiki/Q5> .\n" +
          s"  wd:Q7 wdt:P31 \"human 123\" .\n" +
          s"  $sid ps:P31 \"human 123\" .\n};",
        TS)
    ))
  }

  test("handleNestedTags agrees with the fragment-level HrefExtract.handleNested (C12)") {
    val tags = Seq(
      """<a href="/wiki/Property:P248">stated in</a>""",
      """<a href="/wiki/Q36578">GND</a>"""
    )
    val parsed = tags.map(t => Html.parse(t).children.head.asInstanceOf[Html.Elem])
    val viaTree = DiffHtml.handleNestedTags(parsed, "qualifier", "Q42", 100L, "p:P39")
    val viaFragments = HrefExtract.handleNested(tags, "qualifier", "Q42", None)
    assert(viaTree == viaFragments)
  }

  test("getDatetimeObject: references path, last-claim indexing, qualifier quirks") {
    val json = DiffHtmlGen.entityJsonWithRefTime("Q42", "+2020-05-01T00:00:00Z")
    val tv = DiffHtml.getDatetimeObject(json, "Q42", "p:P39", "P813", "references")
    assert(tv.contains(DiffHtml.TimeValue(Some("+2020-05-01T00:00:00Z"), Some(11), Some(0),
      Some("http://www.wikidata.org/entity/Q1985727"))))
    // missing predicate / entity / malformed json → None (except-fallback)
    assert(DiffHtml.getDatetimeObject(json, "Q42", "p:P39", "P999", "references").isEmpty)
    assert(DiffHtml.getDatetimeObject(json, "Q1", "p:P39", "P813", "references").isEmpty)
    assert(DiffHtml.getDatetimeObject("not json", "Q42", "p:P39", "P813", "references").isEmpty)
    // qualifiers: single-key claim resolves; multi-key always falls back
    // (the reference's >1 branch indexes a dict key string and raises —
    // get_updates.py:727-731)
    val q1 = """{"entities":{"Q42":{"claims":{"P39":[{"qualifiers":{"P585":[{"datavalue":{"value":{"time":"+1999-01-01T00:00:00Z"}}}]}}]}}}}"""
    assert(DiffHtml.getDatetimeObject(q1, "Q42", "p:P39", "P585", "qualifiers")
      .flatMap(_.time).contains("+1999-01-01T00:00:00Z"))
    val q2 = """{"entities":{"Q42":{"claims":{"P39":[{"qualifiers":{"P585":[{"datavalue":{"value":{"time":"+1999-01-01T00:00:00Z"}}}],"P1545":[]}}]}}}}"""
    assert(DiffHtml.getDatetimeObject(q2, "Q42", "p:P39", "P585", "qualifiers").isEmpty)
  }

  test("time-resolved walk: xsd:dateTime object, v:-node statement, TimeValue block (--specific)") {
    val html = DiffHtmlGen.generateReferenceTime(7L)
    val json = DiffHtmlGen.entityJsonWithRefTime("Q42", "+2020-05-01T00:00:00Z")
    val out = DiffHtml.convertToRdf(html, "Q42", TS, 100L, 99L, Some(json), specific = true)
    val h = DiffHtml.mintRefHash("Q42", 100L, "P39")
    val tn = "v:" + DiffHtml.mintTimeNode("Q42", 100L, Some(h), "P39")
    assert(out == Seq(
      RdfOut(tn, "INSERT",
        "INSERT DATA {\n" +
          s"  $tn a wikibase:TimeValue .\n" +
          s"  $tn wikibase:timeValue '+2020-05-01T00:00:00Z'^^xsd:dateTime .\n" +
          s"  $tn wikibase:timePrecision '11'^^xsd:integer .\n" +
          s"  $tn wikibase:timeTimezone '0'^^xsd:integer .\n" +
          s"  $tn wikibase:timeCalendarModel 'http://www.wikidata.org/entity/Q1985727' .\n};\n",
        TS),
      RdfOut("Q42", "INSERT",
        "INSERT DATA {\n" +
          s"  ?statement prov:wasDerivedFrom ref:$h .\n" +
          s"  ref:$h a wikibase:Reference .\n" +
          s"  ref:$h pr:P813 \"+2020-05-01T00:00:00Z\"^^xsd:dateTime .\n" +
          s"  ref:$h prv:P813 $tn .\n\n};",
        TS)
    ))
    // without --specific: dateTime object only, no v:-node rows
    val plain = DiffHtml.convertToRdf(html, "Q42", TS, 100L, 99L, Some(json), specific = false)
    assert(plain.length == 1 && plain.head.rdf.contains("\"+2020-05-01T00:00:00Z\"^^xsd:dateTime"))
    assert(!plain.head.rdf.contains("prv:"))
    // without JSON at all: the reference's except-fallback (extract_href)
    val fallback = DiffHtml.convertToRdf(html, "Q42", TS, 100L, 99L)
    assert(fallback.length == 1 && fallback.head.rdf.contains("pr:P813 \"rendered 7\" ."))
  }

  test("qualifier time never resolves even with JSON (entity_json unbound quirk, reference:584)") {
    val html =
      """<table>
        |<tr><td class="diff-lineno">Property / <a href="/wiki/Property:P39">position</a> / qualifier</td></tr>
        |<tr><td class="diff-addedline"><div><ins class="diffchange"><span><a href="/wiki/Property:P585">point in time</a>: <b class="wb-time-rendered">1 May 2020</b></span></ins></div></td></tr>
        |</table>""".stripMargin
    val q1 = """{"entities":{"Q42":{"claims":{"P39":[{"qualifiers":{"P585":[{"datavalue":{"value":{"time":"+2020-05-01T00:00:00Z"}}}]}}]}}}}"""
    val out = DiffHtml.convertToRdf(html, "Q42", TS, 100L, 99L, Some(q1), specific = true)
    assert(out.length == 1 && out.head.rdf.contains("pq:P585 \"1 May 2020\" ."))
  }

  test("extractSpanPlaintext: a-tag + direct sibling text (dead-code port, reference:919-941)") {
    val v = Html.parse(
      """<div><span><a href="/wiki/Q1">one</a>: two</span><span><a>x</a></span>""" +
        """<span><b>no a</b></span><span><a>y</a> plain</span></div>""")
      .children.head.asInstanceOf[Html.Elem]
    val tags = DiffHtml.extractSpanPlaintext(v)
    // ": two" → startswith(":") drops TWO chars → "two"; bare-colon text skipped
    assert(tags.map(_.getTextRaw) == Vector("two", "plain"))
  }

  test("robustness: seeded random tag soup never throws and is deterministic") {
    // at 100 TB the diff column is untrusted web output — the walk must be
    // total (no exception can kill an executor task) and a pure function of
    // its input (any partitioning/retry yields the same rows)
    val rng = new scala.util.Random(1234)
    val atoms = Array(
      "<tr>", "</tr>", "<td class=\"diff-lineno\">", "<td class=\"diff-addedline\">",
      "<td class=\"diff-deletedline\">", "</td>", "<del class=\"diffchange\">", "</del>",
      "<ins class=\"diffchange\">", "</ins>", "<span>", "</span>", "<a href=\"/wiki/Property:P31\">",
      "<a href=\"/wiki/Q5\">", "<a>", "</a>", "<b class=\"wb-time-rendered\">", "</b>",
      "label / en", "Property / ", "rank", "qualifier", "P: x", "a:b:c", "\"q\"", "&amp;", "&",
      "<table class=\"wb-details wb-time-details\">", "</table>", "<", ">", "<!-- c -->",
      "<td>", "text ", "/ ", "<br>", "<img src=x/>"
    )
    (1 to 300).foreach { i =>
      val doc = Seq.fill(5 + rng.nextInt(60))(atoms(rng.nextInt(atoms.length))).mkString
      val a = DiffHtml.convertToRdf(doc, "Q9", TS, 5L, 4L)
      val b = DiffHtml.convertToRdf(doc, "Q9", TS, 5L, 4L)
      assert(a == b, s"non-deterministic on fuzz case $i")
      a.foreach(r => assert(r.op == "DELETE" || r.op == "INSERT"))
    }
  }

  test("timeNodeBlock: handle_time_node block shape (reference:632-668)") {
    val b = DiffHtml.timeNodeBlock("v:abc", Some("2020-05-01T00:00:00Z"), Some(11), Some(0),
      Some("http://www.wikidata.org/entity/Q1985727"), "delete")
    assert(b ==
      "DELETE DATA {\n" +
        "  v:abc a wikibase:TimeValue .\n" +
        "  v:abc wikibase:timeValue '2020-05-01T00:00:00Z'^^xsd:dateTime .\n" +
        "  v:abc wikibase:timePrecision '11'^^xsd:integer .\n" +
        "  v:abc wikibase:timeTimezone '0'^^xsd:integer .\n" +
        "  v:abc wikibase:timeCalendarModel 'http://www.wikidata.org/entity/Q1985727' .\n" +
        "};\n")
  }
}
