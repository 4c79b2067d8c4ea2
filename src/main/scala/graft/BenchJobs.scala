package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared benchmark job definitions (used by Bench and ScalingProbe). */
object BenchJobs {

  /** Replicated page corpus → deduped canonical triples: every doc
    * duplicated `rep` times with distinct urls — same content distribution,
    * scaled row count, fully deterministic. The small doc set is
    * repartitioned BEFORE the explode so replication + html synthesis run
    * fully parallel (a serial replication section would cap scaling).
    */
  def replicatedTriples(spark: SparkSession, dir: String, rep: Int, parts: Int): DataFrame = {
    import spark.implicits._
    import graft.model.Page
    import graft.text.HtmlCodec
    val docs = graft.sources.Tables.read(spark, dir, "documents")
      .select(
        concat(lit("https://example.org/"), col("source"), lit("/doc"), col("doc_id")).as("url0"),
        expr("timestampadd(MINUTE, cast(doc_id as int), timestamp'2024-01-01 00:00:00')").as("warc_ts"),
        col("text"), col("lang")
      )
      .repartition(parts, col("url0"))
      .withColumn("rep", explode(sequence(lit(0), lit(rep - 1))))
      .select(concat(col("url0"), lit("#r"), col("rep")).as("url"), col("warc_ts"), col("text"), col("lang"))
      .as[(String, java.sql.Timestamp, String, String)]
      .mapPartitions(_.map { case (url, ts, text, lang) =>
        Page(url, ts, HtmlCodec.generate(url, text), text, lang)
      })
    pipeline.KgPipeline.dedupTriples(pipeline.KgPipeline.triples(spark, docs))
  }
}
