package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full KG-construction pipeline (pages → extract → mention
    * scan → link → triples → canonicalize → dedup) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    pipeline.KgPipeline.run(spark, "/root/testdata/sf0.001", numPartitions = 8)

  /** One entry per implemented operator from SURVEY.md §2 (+ training-data
    * additions). SQL-checked queries also appear in oracleSql.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.sqlChecked.map { case (k, (fn, _)) => k -> fn } ++ Queries.rowsOnly

  /** DuckDB-equivalent SQL per SQL-checkable query (same column names/types
    * as the Spark result — the driver hash-compares after sorting columns).
    */
  def oracleSql: Map[String, String] =
    Queries.sqlChecked.map { case (k, (_, sql)) => k -> sql }
}
