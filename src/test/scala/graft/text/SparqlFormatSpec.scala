package graft.text

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{RdfObj, Triple}

/** 1:1 port of /root/reference/test/wikidata_update/test_ttl_compare.py —
  * same fixture strings, same expected output (the P/R anchor of
  * BASELINE.json).
  */
class SparqlFormatSpec extends AnyFunSuite {

  private def lit(lex: String, lang: Option[String] = None, dtype: Option[String] = None) =
    RdfObj(lex, lang, dtype, "literal")

  // ---- TestFormatObjectForSparql (test_ttl_compare.py:209-264) ----

  test("format literal with quotes") {
    assert(SparqlFormat.formatObject(
      lit("He said \"Hello\"", dtype = Some("http://www.w3.org/2001/XMLSchema#string"))
    ) == "\"He said \\\"Hello\\\"\"^^xsd:string")
  }

  test("format language-tagged literal") {
    assert(SparqlFormat.formatObject(lit("Bonjour", lang = Some("fr"))) == "\"Bonjour\"@fr")
  }

  test("format literal with datatype") {
    assert(SparqlFormat.formatObject(
      lit("2023-10-01", dtype = Some("http://www.w3.org/2001/XMLSchema#date"))
    ) == "\"2023-10-01\"^^xsd:date")
  }

  test("format uri") {
    assert(SparqlFormat.formatObject(
      RdfObj("http://www.wikidata.org/entity/Q42", None, None, "uri")
    ) == "<http://www.wikidata.org/entity/Q42>")
    // reference passes the raw uri string (not prefix-replaced) — but our
    // engine replaces first; a wd: uri in object position resolves prefixed:
    assert(SparqlFormat.hasPrefix("wd:Q42"))
  }

  test("format blank node (plain literal spelled _:b0 passes through)") {
    assert(SparqlFormat.formatObject(lit("_:b0")) == "_:b0")
  }

  test("format prefixed name") {
    assert(SparqlFormat.formatObject(RdfObj("wd:Q42", None, None, "prefixed")) == "wd:Q42")
  }

  test("format plain literal") {
    assert(SparqlFormat.formatObject(lit("Hello World")) == "\"Hello World\"")
  }

  test("format literal with timezone normalization +00:00 -> Z") {
    assert(SparqlFormat.formatObject(
      lit("2023-10-01T12:00:00+00:00", dtype = Some("http://www.w3.org/2001/XMLSchema#dateTime"))
    ) == "\"2023-10-01T12:00:00Z\"^^xsd:dateTime")
  }

  // ---- TestReplacePrefixes (test_ttl_compare.py:267-305) ----

  test("replace_prefixes full uri") {
    assert(SparqlFormat.replacePrefixes("http://www.wikidata.org/entity/Q42") == "wd:Q42")
  }
  test("replace_prefixes partial uri") {
    assert(SparqlFormat.replacePrefixes("http://www.wikidata.org/prop/direct/P31") == "wdt:P31")
  }
  test("replace_prefixes no match") {
    assert(SparqlFormat.replacePrefixes("http://example.org/entity/Q42") == "http://example.org/entity/Q42")
  }
  test("replace_prefixes multiple matches") {
    assert(SparqlFormat.replacePrefixes(
      "http://www.wikidata.org/entity/Q42 http://www.wikidata.org/prop/direct/P31"
    ) == "wd:Q42 wdt:P31")
  }
  test("replace_prefixes empty string") {
    assert(SparqlFormat.replacePrefixes("") == "")
  }
  test("replace_prefixes mixed content") {
    assert(SparqlFormat.replacePrefixes(
      "Some text http://www.wikidata.org/entity/Q42 and more text"
    ) == "Some text wd:Q42 and more text")
  }
  test("replace_prefixes ordering: value-normalized before statement") {
    assert(SparqlFormat.replacePrefixes(
      "http://www.wikidata.org/prop/statement/value-normalized/P569"
    ) == "psn:P569")
    assert(SparqlFormat.replacePrefixes(
      "http://www.wikidata.org/prop/statement/value/P569"
    ) == "psv:P569")
    assert(SparqlFormat.replacePrefixes(
      "http://www.wikidata.org/prop/statement/P569"
    ) == "ps:P569")
  }

  test("PrefixTrie single-pass == sequential replace chain on 2000 seeded random strings") {
    val rng = new scala.util.Random(99)
    val pieces = SparqlFormat.prefixes.map(_._1) ++ Seq(
      "Q42", "P31", " ", "http", "http://", "/statement/", "entity/", "xyz",
      "http://example.org/", "\"lit\"", "htt", "hhttp://www.wikidata.org/entity/"
    )
    (0 until 2000).foreach { _ =>
      val s = (0 until rng.nextInt(8)).map(_ => pieces(rng.nextInt(pieces.size))).mkString
      assert(PrefixTrie.replaceAll(s) == SparqlFormat.replacePrefixes(s), s"input=$s")
    }
  }

  test("property: replacePrefixes is idempotent on its own output") {
    val rng = new scala.util.Random(7)
    val pieces = SparqlFormat.prefixes.map(_._1) ++ Seq("Q1", " x ", "http://other/")
    (0 until 500).foreach { _ =>
      val s = (0 until rng.nextInt(6)).map(_ => pieces(rng.nextInt(pieces.size))).mkString
      val once = SparqlFormat.replacePrefixes(s)
      assert(SparqlFormat.replacePrefixes(once) == once)
    }
  }

  test("property: quote-escape inverts under unescape for any literal body") {
    val rng = new scala.util.Random(11)
    (0 until 500).foreach { _ =>
      val body = Array.fill(rng.nextInt(40))(
        "ab\"\\ c".charAt(rng.nextInt(6))).mkString
      val rendered = SparqlFormat.formatObject(
        graft.model.RdfObj(body, None, None, "literal"))
      if (!body.startsWith("_:")) {
        val inner = rendered.substring(1, rendered.length - 1)
        assert(inner.replace("\\\"", "\"") == body)
      }
    }
  }

  // ---- TestHasPrefix (test_ttl_compare.py:308-345) ----

  test("has_prefix cases") {
    assert(SparqlFormat.hasPrefix("wd:Q42"))
    assert(!SparqlFormat.hasPrefix("ex:Q42"))
    assert(!SparqlFormat.hasPrefix(""))
    assert(!SparqlFormat.hasPrefix("wdQ42"))
    assert(!SparqlFormat.hasPrefix("Some text wd:Q42 and more text"))
    assert(SparqlFormat.hasPrefix("wdt:P31"))
    assert(!SparqlFormat.hasPrefix("Q42"))
  }

  // ---- TestTriplesToSparql (test_ttl_compare.py:128-206) ----

  private val dateObj = Triple("wd:Q42", "wdt:P569", "1952-03-11",
    None, Some("http://www.w3.org/2001/XMLSchema#date"), "literal")
  private val entObj = Triple("wd:Q42", "wdt:P31", "wd:Q5", None, None, "prefixed")

  test("triples_to_sparql insert") {
    val res = SparqlFormat.triplesToSparql(Seq(dateObj, entObj), "INSERT", "Q42")
    assert(res ==
      "INSERT DATA { wd:Q42 wdt:P569 \"1952-03-11\"^^xsd:date . };\n" +
      "INSERT DATA { wd:Q42 wdt:P31 wd:Q5 . };")
  }

  test("triples_to_sparql delete") {
    val res = SparqlFormat.triplesToSparql(Seq(dateObj, entObj), "DELETE", "Q42")
    assert(res ==
      "DELETE DATA { wd:Q42 wdt:P569 \"1952-03-11\"^^xsd:date . };\n" +
      "DELETE DATA { wd:Q42 wdt:P31 wd:Q5 . };")
  }

  test("triples_to_sparql skip owl") {
    val owl = Triple("wd:Q42", "http://www.w3.org/2002/07/owl#someValuesFrom",
      "wd:Q5", None, None, "prefixed")
    val res = SparqlFormat.triplesToSparql(Seq(dateObj, owl), "INSERT", "Q42")
    assert(res == "INSERT DATA { wd:Q42 wdt:P569 \"1952-03-11\"^^xsd:date . };")
  }

  test("triples_to_sparql skip non-matching entity") {
    val foreign = Triple("wd:Q12345", "wdt:P31", "wd:Q5", None, None, "prefixed")
    val res = SparqlFormat.triplesToSparql(Seq(dateObj, foreign), "INSERT", "Q42")
    assert(res == "INSERT DATA { wd:Q42 wdt:P569 \"1952-03-11\"^^xsd:date . };")
  }

  test("triples_to_sparql skip property subject") {
    val propSubj = Triple("wd:P123", "wdt:P31", "wd:Q5", None, None, "prefixed")
    val res = SparqlFormat.triplesToSparql(Seq(dateObj, propSubj), "INSERT", "Q42")
    assert(res == "INSERT DATA { wd:Q42 wdt:P569 \"1952-03-11\"^^xsd:date . };")
  }

  test("rdf:type shortened to a") {
    val t = Triple("http://www.wikidata.org/entity/statement/Q42-xyz",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
      "wikibase:Statement", None, None, "prefixed")
    val res = SparqlFormat.triplesToSparql(Seq(t), "INSERT", "Q42")
    assert(res == "INSERT DATA { s:Q42-xyz a wikibase:Statement . };")
  }

  // ---- BCE dates (ttl_compare.py:345-369) ----

  test("preprocess_bce_dates rewrites negative years and keeps mapping") {
    val in = "wd:Q1 wdt:P569 \"-0500-01-01T00:00:00Z\"^^xsd:dateTime ."
    val (out, map) = SparqlFormat.preprocessBceDates(in)
    assert(out == "wd:Q1 wdt:P569 \"BCE_0500-01-01T00:00:00Z\" .")
    assert(map == Map("\"BCE_0500-01-01T00:00:00Z\"" -> "-0500-01-01T00:00:00Z"))
  }

  test("preprocess_bce_dates leaves CE dates alone") {
    val in = "wd:Q1 wdt:P569 \"1952-03-11T00:00:00Z\"^^xsd:dateTime ."
    val (out, map) = SparqlFormat.preprocessBceDates(in)
    assert(out == in && map.isEmpty)
  }

  // ---- to_camel_case (get_updates.py:951-958) ----

  test("to_camel_case") {
    assert(SparqlFormat.toCamelCase("\"normal rank\"") == "NormalRank")
    assert(SparqlFormat.toCamelCase("preferred rank") == "PreferredRank")
    assert(SparqlFormat.toCamelCase(" deprecated  rank ") == "DeprecatedRank")
  }

  // ---- normalize_predicate (get_updates.py:360-373) ----

  test("normalize_predicate families") {
    assert(SparqlFormat.normalizePredicate("reference", "wdt:P31") == (("prov:wasDerivedFrom", false)))
    assert(SparqlFormat.normalizePredicate("rank", "wdt:P31") == (("wikibase:rank", false)))
    assert(SparqlFormat.normalizePredicate("p:P569", "wdt:P31") == (("ps:P569", false)))
    assert(SparqlFormat.normalizePredicate("ps:P569", "wdt:P31") == (("ps:P569", true)))
    assert(SparqlFormat.normalizePredicate("label", "wdt:P31") == (("wdt:P31", false)))
    assert(SparqlFormat.normalizePredicate("qualifier", "wdt:P31") == (("qualifier", false)))
  }

  // ---- get_third_element (get_updates.py:703-708) ----

  test("get_third_element quoted-aware, ps-gated") {
    assert(SparqlFormat.getThirdElement("?st ps:P569 \"1952-03-11\"") == Some("\"1952-03-11\""))
    assert(SparqlFormat.getThirdElement("?st ps:P31 wd:Q5") == Some("wd:Q5"))
    assert(SparqlFormat.getThirdElement("wd:Q42 wdt:P31 wd:Q5") == None)
  }

  // ---- replace_prefixes narrow variant (get_updates.py:677-692) ----

  test("narrow prefix replace dispatches on first match only") {
    assert(SparqlFormat.replacePrefixesNarrow("http://www.wikidata.org/entity/Q42") == "wd:Q42")
    assert(SparqlFormat.replacePrefixesNarrow("http://www.wikidata.org/prop/statement/P5") == "ps:P5")
    assert(SparqlFormat.replacePrefixesNarrow("http://www.wikidata.org/prop/reference/value/x") == "prv:x")
    assert(SparqlFormat.replacePrefixesNarrow("http://www.wikidata.org/prop/P5") == "p:P5")
    assert(SparqlFormat.replacePrefixesNarrow("nothing") == "nothing")
  }
}
