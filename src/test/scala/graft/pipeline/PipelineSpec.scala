package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("E2E: pipeline emits deduped canonical triples; dedup is idempotent") {
    val out = KgPipeline.run(spark, sfDir, numPartitions = 4).cache()
    val n = out.count()
    assert(n > 0)
    // windowed distinct ⇒ (subj,pred,obj,url) unique
    assert(out.select("subj", "pred", "obj", "url").distinct().count() == n)
    // all subjects/objects canonical-prefixed
    assert(out.filter(!col("subj").startsWith("wd:") && !col("subj").startsWith("data:")).count() == 0)
    assert(out.filter(!col("obj").startsWith("wd:")).count() == 0)
    // dedup idempotence
    assert(KgPipeline.dedupTriples(out).count() == n)
    out.unpersist()
  }

  test("E2E golden: fixed two-page corpus produces the exact expected triple set") {
    import spark.implicits._
    import graft.model.Page
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val pages = Seq(
      Page("u1", ts, graft.text.HtmlCodec.generate("u1", "spark query table"), "spark query table", "en"),
      Page("u2", ts, graft.text.HtmlCodec.generate("u2", "scan scan merge"), "scan scan merge", "en")
    ).toDS()
    val triples = KgPipeline.dedupTriples(KgPipeline.triples(spark, pages))
      .select("subj", "pred", "obj", "url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    val expected = Set(
      // u1 aboutness: spark→Q1001, query→Q1011, table→Q1013 (prior winner)
      ("data:u1", "schema:about", "wd:Q1001", "u1"),
      ("data:u1", "schema:about", "wd:Q1011", "u1"),
      ("data:u1", "schema:about", "wd:Q1013", "u1"),
      // u1 adjacency chain within 30 chars
      ("wd:Q1001", "wdt:P1002", "wd:Q1011", "u1"),
      ("wd:Q1011", "wdt:P1002", "wd:Q1013", "u1"),
      // u2: scan→Q1002 twice (dedup to one aboutness), merge→Q1005
      ("data:u2", "schema:about", "wd:Q1002", "u2"),
      ("data:u2", "schema:about", "wd:Q1005", "u2"),
      ("wd:Q1002", "wdt:P1002", "wd:Q1005", "u2")
    )
    assert(triples == expected)
  }

  test("emit: reference-shaped INSERT command blocks, sorted within block") {
    import spark.implicits._
    val t = Seq(
      ("wd:Q1", "wdt:P1", "wd:Q2", "u1", java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      ("wd:Q1", "wdt:P1", "wd:Q0", "u1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    ).toDF("subj", "pred", "obj", "url", "ts")
    val rows = KgPipeline.emit(t).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("block") ==
      "INSERT DATA { wd:Q1 wdt:P1 wd:Q0 . };\nINSERT DATA { wd:Q1 wdt:P1 wd:Q2 . };")
  }

  test("goldenFile: prefix header then blank-line-separated blocks (write_to_file grammar)") {
    val f = KgPipeline.goldenFile(Seq("INSERT DATA { a b c . };", "DELETE DATA { d e f . };"))
    assert(f.startsWith("PREFIX wd: <http://www.wikidata.org/entity/>\n"))
    assert(f.contains("PREFIX data: <https://www.wikidata.org/wiki/Special:EntityData/>\n"))
    assert(f.endsWith("INSERT DATA { a b c . };\n\nDELETE DATA { d e f . };\n\n"))
  }

  test("runResumable: full-pipeline resume — recompute only stale partitions, output equals direct run") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft-resume").toString
    val n1 = KgPipeline.runResumable(spark, sfDir, s"$tmp/triples", s"$tmp/manifest", nParts = 8)
    assert(n1 == 8)
    val n2 = KgPipeline.runResumable(spark, sfDir, s"$tmp/triples", s"$tmp/manifest", nParts = 8)
    assert(n2 == 0) // fully checkpointed: nothing recomputes

    val resumed = spark.read.parquet(s"$tmp/triples")
      .select("subj", "pred", "obj", "url").collect().map(_.toSeq).toSet
    val direct = KgPipeline.run(spark, sfDir, 4)
      .select("subj", "pred", "obj", "url").collect().map(_.toSeq).toSet
    assert(resumed == direct)

    // metrics present per partition
    val man = spark.read.parquet(s"$tmp/manifest")
    assert(man.filter(col("stage") === "kg_triples").count() == 8)
    assert(man.filter(col("rows_out") > 0).count() == 8)
  }

  test("prefix header is byte-identical to the reference's captured output header") {
    val sample = new String(
      Files.readAllBytes(java.nio.file.Paths.get("/root/reference/sample_result.txt")),
      "UTF-8")
    val sampleHeader = sample.linesIterator.take(20).mkString("\n")
    assert(graft.text.SparqlFormat.prefixHeader == sampleHeader)
  }

  test("goldenChangesFile: block layout matches the reference's changes-file grammar") {
    val diff = "DELETE DATA { data:Q1 schema:version \"1\"^^xsd:integer . };\n" +
      "INSERT DATA { data:Q1 schema:version \"2\"^^xsd:integer . };"
    val f = KgPipeline.goldenChangesFile(Seq(("Q1", 1L, 2L, diff)))
    // header, blank, change-info element, blank, diff, blank, separator, blank
    assert(f.contains("\nchanges for entity: Q1 between old_revid: 1 and new_revid: 2\n\n"))
    assert(f.contains(diff + "\n\n"))
    assert(f.contains("\n" + "=" * 80 + "\n"))
    // same shape as the captured sample: info line then blank then commands
    val sample = new String(
      Files.readAllBytes(java.nio.file.Paths.get("/root/reference/sample_result.txt")),
      "UTF-8")
    assert(sample.contains("\nchanges for entity: Q108271934 between old_revid: 2289500175 and new_revid: 2289504733\n\n"))
    assert(sample.contains("\n" + "=" * 80 + "\n"))
  }

  test("manifest: stage resumes — second run computes zero partitions, changed input invalidates") {
    val tmp = Files.createTempDirectory("graft-manifest").toString
    val input = Tables.pages(spark, sfDir).toDF()
      .select(col("url"), col("text"), col("lang"))
    val stageFn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.withColumn("n_tokens", size(split(col("text"), " ")))

    val n1 = Manifest.runStage(spark, input, "url", 8, "tokenize", s"$tmp/out", s"$tmp/manifest")(stageFn)
    assert(n1 == 8)
    val rows1 = spark.read.parquet(s"$tmp/out").count()
    assert(rows1 == input.count())

    // resume: nothing pending
    val n2 = Manifest.runStage(spark, input, "url", 8, "tokenize", s"$tmp/out", s"$tmp/manifest")(stageFn)
    assert(n2 == 0)

    // changed input (one url dropped) → only affected partitions recompute
    val input2 = input.filter(col("url") =!= "https://example.org/src0/doc0")
    val n3 = Manifest.runStage(spark, input2, "url", 8, "tokenize", s"$tmp/out", s"$tmp/manifest")(stageFn)
    assert(n3 >= 1 && n3 < 8)

    // manifest has lineage metrics
    val man = spark.read.parquet(s"$tmp/manifest")
    assert(man.columns.toSet == Manifest.schemaCols.toSet)
    assert(man.filter(col("rows_out") > 0).count() > 0)
  }
}
