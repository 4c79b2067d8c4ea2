package graft.operators

import graft.SparkSpec
import graft.operators.NewEntityRdf.{Claim, EntityDoc}

/** Golden tests for A3 — block grammar from
  * /root/reference/src/wikidata_update/new_entity_rdf.py:54-116 (fixture
  * shape per FIXTURES.md §5).
  */
class NewEntityRdfSpec extends SparkSpec {

  val doc = EntityDoc(
    id = "Q999",
    labels = Seq("en" -> "Douglas Adams"),
    descriptions = Seq("en" -> "English writer"),
    aliases = Seq("en" -> "DNA"),
    claims = Seq(
      Claim("P31", "wikibase-entityid", "Q5", ""),
      Claim("P569", "time", "+1952-03-11T00:00:00Z", ""),
      Claim("P2067", "quantity", "+70", ""),
      Claim("P1477", "monolingualtext", "Douglas Noel Adams", "en"),
      Claim("P123", "string", "plain", "")
    )
  )

  val expected: String =
    """INSERT DATA {
      |  wd:Q999 a schema:Thing ;
      |    schema:name "Douglas Adams"@en ;
      |    schema:description "English writer"@en ;
      |    skos:altLabel "DNA"@en ;
      |    wdt:P31 wd:Q5 ;
      |    wdt:P569 "+1952-03-11T00:00:00Z"^^xsd:dateTime ;
      |    wdt:P2067 "+70"^^xsd:decimal ;
      |    wdt:P1477 "Douglas Noel Adams"@en ;
      |    wdt:P123 "plain" .
      |};
      |""".stripMargin

  test("pure render matches the reference block grammar byte-for-byte") {
    assert(NewEntityRdf.render(doc) == expected)
  }

  test("render: entity with no facets still closes the block") {
    val bare = NewEntityRdf.render(EntityDoc("Q1", Nil, Nil, Nil, Nil))
    assert(bare == "INSERT DATA {\n  wd:Q1 a schema:Thing .\n};\n")
  }

  test("distributed from_json form produces the same block for the same doc") {
    import spark.implicits._
    val json =
      """{"id":"Q999",
        |"labels":{"en":{"language":"en","value":"Douglas Adams"}},
        |"descriptions":{"en":{"language":"en","value":"English writer"}},
        |"aliases":{"en":[{"value":"DNA"}]},
        |"claims":{
        |  "P31":[{"mainsnak":{"datavalue":{"type":"wikibase-entityid","value":{"id":"Q5"}}}}],
        |  "P569":[{"mainsnak":{"datavalue":{"type":"time","value":{"time":"+1952-03-11T00:00:00Z"}}}}],
        |  "P2067":[{"mainsnak":{"datavalue":{"type":"quantity","value":{"amount":"+70"}}}}],
        |  "P1477":[{"mainsnak":{"datavalue":{"type":"monolingualtext","value":{"text":"Douglas Noel Adams","language":"en"}}}}],
        |  "P123":[{"mainsnak":{"datavalue":{"type":"string","value":{"content":"plain"}}}}]
        |}}""".stripMargin.replace("\n", "")
    val out = NewEntityRdf.fromJson(spark, Seq(json).toDF("doc"), "doc").collect()
    assert(out.length == 1)
    val block = out.head.getAs[String]("insert_block")
    // distributed ordering is (facet rank, key) — same facet order as the
    // reference; claim order is by pid (maps are unordered in JSON), so
    // compare as line sets + structure rather than byte order
    assert(block.startsWith("INSERT DATA {\n  wd:Q999 a schema:Thing ;\n"))
    assert(block.endsWith(" .\n};\n"))
    val wantLines = expected.linesIterator.toSet
    val gotLines = block.linesIterator.toSet
    // allow the ;/. swap to land on a different claim line than the pure form
    def norm(s: Set[String]) = s.map(_.stripSuffix(" ;").stripSuffix(" ."))
    assert(norm(gotLines) == norm(wantLines))
  }

  test("reference-hash navigation (J5): first reference hash per claim") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val json =
      """{"id":"Q7","claims":{"P570":[
        |{"mainsnak":{"datavalue":{"type":"string","value":{"content":"x"}}},
        | "references":[{"hash":"b0096c6f"},{"hash":"ignored"}]}]}}"""
        .stripMargin.replace("\n", "")
    val parsed = Seq(json).toDF("doc")
      .select(from_json(col("doc"), NewEntityRdf.entityJsonSchema).as("e"))
      .select(col("e.id").as("id"), explode(col("e.claims")).as(Seq("pid", "cs")))
      .select(col("id"), col("pid"),
        element_at(element_at(col("cs"), 1).getField("references"), 1)
          .getField("hash").as("ref_hash"))
    val row = parsed.head()
    assert(row.getString(0) == "Q7" && row.getString(1) == "P570" && row.getString(2) == "b0096c6f")
  }
}
