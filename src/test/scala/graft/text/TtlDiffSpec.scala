package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Triple

/** Ports TestDiffTTLs (/root/reference/test/wikidata_update/
  * test_ttl_compare.py:86-125) with the same fixture strings, exercising the
  * Turtle parser + set difference + command emission end to end (pure-Scala
  * path; the distributed path is covered in graft.operators specs).
  */
class TtlDiffSpec extends AnyFunSuite {

  val FullPrefixes: String = """
    @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    @prefix ontolex: <http://www.w3.org/ns/lemon/ontolex#> .
    @prefix dct: <http://purl.org/dc/terms/> .
    @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
    @prefix owl: <http://www.w3.org/2002/07/owl#> .
    @prefix wikibase: <http://wikiba.se/ontology#> .
    @prefix skos: <http://www.w3.org/2004/02/skos/core#> .
    @prefix schema: <http://schema.org/> .
    @prefix cc: <http://creativecommons.org/ns#> .
    @prefix geo: <http://www.opengis.net/ont/geosparql#> .
    @prefix prov: <http://www.w3.org/ns/prov#> .
    @prefix wd: <http://www.wikidata.org/entity/> .
    @prefix data: <https://www.wikidata.org/wiki/Special:EntityData/> .
    @prefix s: <http://www.wikidata.org/entity/statement/> .
    @prefix ref: <http://www.wikidata.org/reference/> .
    @prefix v: <http://www.wikidata.org/value/> .
    @prefix wdt: <http://www.wikidata.org/prop/direct/> .
    @prefix wdtn: <http://www.wikidata.org/prop/direct-normalized/> .
    @prefix p: <http://www.wikidata.org/prop/> .
    @prefix ps: <http://www.wikidata.org/prop/statement/> .
    @prefix psv: <http://www.wikidata.org/prop/statement/value/> .
    @prefix psn: <http://www.wikidata.org/prop/statement/value-normalized/> .
    @prefix pq: <http://www.wikidata.org/prop/qualifier/> .
    @prefix pqv: <http://www.wikidata.org/prop/qualifier/value/> .
    @prefix pqn: <http://www.wikidata.org/prop/qualifier/value-normalized/> .
    @prefix pr: <http://www.wikidata.org/prop/reference/> .
    @prefix prv: <http://www.wikidata.org/prop/reference/value/> .
    @prefix prn: <http://www.wikidata.org/prop/reference/value-normalized/> .
    @prefix wdno: <http://www.wikidata.org/prop/novalue/> .
    """

  val oldTtl: String = FullPrefixes + """
        wd:Q42 wdt:P31 wd:Q5 .
        wd:Q42 wdt:P21 wd:Q6581097 .
        """
  val newTtl: String = FullPrefixes + """
        wd:Q42 wdt:P31 wd:Q5 .
        wd:Q42 wdt:P21 wd:Q6581097 .
        wd:Q42 wdt:P569 "1952-03-11"^^xsd:date .
        """

  /** diff_ttls semantics (ttl_compare.py:155-188): parse both, set-diff both
    * directions, DELETE commands then INSERT commands.
    */
  private def diffTtls(o: String, n: String, entity: String): String = {
    val (of, _) = SparqlFormat.preprocessBceDates(o)
    val (nf, _) = SparqlFormat.preprocessBceDates(n)
    val go = Turtle.parse(of)
    val gn = Turtle.parse(nf)
    val added = (gn -- go).toSeq.sortBy(t => (t.subj, t.pred, t.obj))
    val removed = (go -- gn).toSeq.sortBy(t => (t.subj, t.pred, t.obj))
    SparqlFormat.triplesToSparql(removed, "DELETE", entity) + "\n" +
      SparqlFormat.triplesToSparql(added, "INSERT", entity)
  }

  test("diff_ttls addition") {
    val result = diffTtls(oldTtl, newTtl, "Q42")
    assert(result.contains("INSERT DATA { wd:Q42 wdt:P569 \"1952-03-11\"^^xsd:date . };"))
  }

  test("diff_ttls deletion") {
    val small = """
        @prefix wd: <http://www.wikidata.org/entity/> .
        @prefix wdt: <http://www.wikidata.org/prop/direct/> .
        wd:Q42 wdt:P31 wd:Q5 .
        wd:Q42 wdt:P21 wd:Q6581097 .
        """
    val result = diffTtls(newTtl, small, "Q42")
    assert(result.contains("DELETE DATA { wd:Q42 wdt:P569 \"1952-03-11\"^^xsd:date . };"))
  }

  test("diff_ttls no change") {
    assert(diffTtls(oldTtl, oldTtl, "Q42").trim == "")
  }

  test("old_revid==0 means empty old graph: everything inserted") {
    val result = diffTtls("", oldTtl, "Q42")
    assert(result.contains("INSERT DATA { wd:Q42 wdt:P31 wd:Q5 . };"))
    assert(result.contains("INSERT DATA { wd:Q42 wdt:P21 wd:Q6581097 . };"))
    assert(!result.contains("DELETE"))
  }

  test("turtle parser: uris expand, lang + datatype literals, bnodes, a-shorthand") {
    val ts = Turtle.parse(FullPrefixes + """
      wd:Q1 rdfs:label "Douglas"@en .
      wd:Q1 a wikibase:Item .
      _:b0 wdt:P31 <http://example.org/x> .
      wd:Q1 wdt:P569 "1952-03-11T00:00:00+00:00"^^xsd:dateTime .
      """)
    assert(ts.contains(Triple("http://www.wikidata.org/entity/Q1",
      "http://www.w3.org/2000/01/rdf-schema#label", "Douglas", Some("en"), None, "literal")))
    assert(ts.contains(Triple("http://www.wikidata.org/entity/Q1",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
      "http://wikiba.se/ontology#Item", None, None, "uri")))
    assert(ts.contains(Triple("_:b0", "http://www.wikidata.org/prop/direct/P31",
      "http://example.org/x", None, None, "uri")))
    assert(ts.contains(Triple("http://www.wikidata.org/entity/Q1",
      "http://www.wikidata.org/prop/direct/P569", "1952-03-11T00:00:00+00:00",
      None, Some("http://www.w3.org/2001/XMLSchema#dateTime"), "literal")))
  }

  test("turtle parser: semicolon chains share subject") {
    val ts = Turtle.parse("""
      @prefix wd: <http://www.wikidata.org/entity/> .
      @prefix wdt: <http://www.wikidata.org/prop/direct/> .
      wd:Q1 wdt:P31 wd:Q5 ; wdt:P21 wd:Q6581097 .
      """)
    assert(ts.size == 2)
    assert(ts.forall(_.subj == "http://www.wikidata.org/entity/Q1"))
  }

  test("full uri rendering through command emission") {
    val ts = Turtle.parse(FullPrefixes + """
      wd:Q42 wdt:P856 <https://douglasadams.com/> .
      """)
    val cmd = SparqlFormat.triplesToSparql(ts.toSeq, "INSERT", "Q42")
    assert(cmd == "INSERT DATA { wd:Q42 wdt:P856 <https://douglasadams.com/> . };")
  }
}
