package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): times the headline queries on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Additionally produces the BASELINE.json scaling evidence in-sandbox: the
  * same KG-pipeline job over the same (deterministically replicated) input
  * at local[8] and local[32], reporting triples/sec at both plus
  * efficiency = (thr_32/thr_8)/(32/8) — the N vs 4N executor protocol of
  * the north rule, evidenced with threads standing in for executors
  * (SURVEY.md §7.6).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores * 2, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Replicated page corpus: every doc duplicated `rep` times with distinct
    * urls — same content distribution, scaled row count, fully deterministic.
    */
  private def replicatedTriples(spark: SparkSession, dir: String, rep: Int, parts: Int): DataFrame = {
    import spark.implicits._
    import graft.model.Page
    import graft.text.HtmlCodec
    val docs = graft.sources.Tables.read(spark, dir, "documents")
      .select(
        concat(lit("https://example.org/"), col("source"), lit("/doc"), col("doc_id")).as("url0"),
        expr("timestampadd(MINUTE, cast(doc_id as int), timestamp'2024-01-01 00:00:00')").as("warc_ts"),
        col("text"), col("lang")
      )
      .withColumn("rep", explode(sequence(lit(0), lit(rep - 1))))
      .select(concat(col("url0"), lit("#r"), col("rep")).as("url"), col("warc_ts"), col("text"), col("lang"))
      .repartition(parts, col("url"))
      .as[(String, java.sql.Timestamp, String, String)]
      .mapPartitions(_.map { case (url, ts, text, lang) =>
        Page(url, ts, HtmlCodec.generate(url, text), text, lang)
      })
    pipeline.KgPipeline.dedupTriples(pipeline.KgPipeline.triples(spark, docs))
  }

  /** One timed scaling run: returns (triples, wallSec). */
  private def scalingRun(cores: Int, dir: String, rep: Int): (Long, Double) = {
    val spark = session(cores)
    try {
      val parts = cores * 4 // enough splits that 32 threads stay busy
      val t0 = System.nanoTime()
      val n = replicatedTriples(spark, dir, rep, parts).count()
      (n, (System.nanoTime() - t0) / 1e9)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rep = sys.env.getOrElse("SPARK_GRAFT_BENCH_REP", "64").toInt

    // -------- headline query timings at the configured parallelism --------
    val headline: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q03_agg" -> (Queries.q03Agg _),
      "q04_join_regions" -> (Queries.q04JoinRegions _),
      "q09_window_topk" -> (Queries.q09WindowTopK _),
      "q17_extract_text" -> (Queries.q17ExtractText _),
      "q18_mentions" -> (Queries.q18Mentions _),
      "q20_triples" -> (Queries.q20Triples _),
      "q23_triple_diff" -> (Queries.q23TripleDiff _),
      "q25_dedup_docs" -> (Queries.q25DedupDocs _),
      "q26_minhash_pairs" -> (Queries.q26MinHashPairs _),
      "q29_ann_brute" -> (Queries.q29AnnBrute _),
      "q39_sessionize" -> (Queries.q39Sessionize _),
      "q40_pipeline" -> (Queries.q40Pipeline _)
    )
    val sHead = session(cpus)
    val results = headline.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(sHead, sfDir).count() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    sHead.stop()

    // ----------------- scaling evidence: local[8] vs local[32] ------------
    val (n8, t8) = scalingRun(8, sfDir, rep)
    val (n32, t32) = scalingRun(32, sfDir, rep)
    val thr8 = n8 / t8
    val thr32 = n32 / t32
    val eff = (thr32 / thr8) / (32.0 / 8.0)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = f"${results.map(_._2).sum}%.3f"
    val scaling = f"""{"job":"kg_pipeline_rep$rep","triples":$n32,"sec_8":$t8%.2f,"sec_32":$t32%.2f,"triples_per_sec_8":$thr8%.0f,"triples_per_sec_32":$thr32%.0f,"efficiency":$eff%.3f}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}"""
    )
  }
}
