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
