package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint / resume with per-partition lineage + metrics (north_rule;
  * SURVEY.md §7.5) — the batch-native replacement for the reference's
  * no-state-across-runs posture (get_updates.py:1158 processes one bounded
  * window per invocation and forgets everything).
  *
  * Model: each stage's output is written partitioned by `part_key`
  * (pmod(xxhash64(url), nParts)); after a partition lands, a manifest row
  * (stage, part_key, input_fingerprint, rows_in, rows_out, wall_ms, status)
  * is appended. Resume = anti-join the input's part-keys against completed
  * manifest rows and recompute only the missing/stale ones — idempotent
  * because every stage is a deterministic function of its input partition +
  * broadcast dims, and writes are overwrite-by-partition.
  *
  * On Iceberg the manifest append + data write share a transaction per
  * snapshot; on local Parquet (this sandbox) the manifest is its own
  * append-only table — same read path, weaker atomicity, documented in
  * BASELINE.md.
  */
object Manifest {

  val schemaCols: Seq[String] =
    Seq("stage", "part_key", "input_fingerprint", "rows_in", "rows_out", "wall_ms", "status")

  def partKey(urlCol: org.apache.spark.sql.Column, nParts: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(urlCol), lit(nParts.toLong))

  /** Order-independent fingerprint of a partition's input rows: bitwise XOR
    * of per-row 64-bit hashes — commutative (stable under any scan order) and
    * overflow-free under ANSI mode, unlike a sum.
    */
  def fingerprintCol(cols: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    bit_xor(xxhash64(cols: _*))

  def readManifest(spark: SparkSession, manifestPath: String): DataFrame = {
    val p = new java.io.File(manifestPath)
    if (!p.exists())
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "stage STRING, part_key BIGINT, input_fingerprint BIGINT, " +
            "rows_in BIGINT, rows_out BIGINT, wall_ms BIGINT, status STRING"
        )
      )
    else spark.read.parquet(manifestPath)
  }

  /** Per-partition lineage rows for `input` keyed by part_key: fingerprint +
    * row count. This is what gets compared against the stored manifest.
    */
  def lineage(input: DataFrame, urlCol: String, nParts: Int): DataFrame =
    input
      .groupBy(partKey(col(urlCol), nParts).as("part_key"))
      .agg(
        fingerprintCol(Seq(col(urlCol))).as("input_fingerprint"),
        count(lit(1)).as("rows_in")
      )

  /** Partitions still to compute: input lineage anti-joined against manifest
    * rows that are complete for this stage AND whose stored fingerprint still
    * matches (changed input ⇒ recompute — lineage-aware invalidation).
    */
  def pendingParts(
      spark: SparkSession,
      input: DataFrame,
      urlCol: String,
      nParts: Int,
      manifestPath: String,
      stage: String
  ): DataFrame = {
    val lin = lineage(input, urlCol, nParts)
    val done = readManifest(spark, manifestPath)
      .filter(col("stage") === stage && col("status") === "ok")
      .select(col("part_key"), col("input_fingerprint").as("done_fp"))
    lin
      .join(done, Seq("part_key"), "left_outer")
      .filter(col("done_fp").isNull || col("done_fp") =!= col("input_fingerprint"))
      .select("part_key", "input_fingerprint", "rows_in")
  }

  /** Run one stage resumably: compute only pending partitions, write them
    * with partition-overwrite, append manifest rows with metrics. Returns
    * the number of partitions actually computed.
    */
  def runStage(
      spark: SparkSession,
      input: DataFrame,
      urlCol: String,
      nParts: Int,
      stage: String,
      outPath: String,
      manifestPath: String
  )(transform: DataFrame => DataFrame): Long = {
    val pending = pendingParts(spark, input, urlCol, nParts, manifestPath, stage)
    val pendingKeys = pending.collect() // small: ≤ nParts rows by construction
    if (pendingKeys.isEmpty) return 0L

    val keys = pendingKeys.map(_.getLong(0)).toSet
    val keyLit = keys.toSeq
    val t0 = System.nanoTime()
    val inputPending = input
      .withColumn("part_key", partKey(col(urlCol), nParts))
      .filter(col("part_key").isin(keyLit: _*))

    val out = transform(inputPending)
    val withKey =
      if (out.columns.contains("part_key")) out
      else out.withColumn("part_key", partKey(col(urlCol), nParts))

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    withKey.write.mode("overwrite").partitionBy("part_key").parquet(outPath)

    val rowsOut = spark.read.parquet(outPath)
      .filter(col("part_key").isin(keyLit: _*))
      .groupBy("part_key").agg(count(lit(1)).as("rows_out"))

    val wallMs = (System.nanoTime() - t0) / 1000000
    val manifestRows = pending
      .join(rowsOut, Seq("part_key"), "left_outer")
      .select(
        lit(stage).as("stage"),
        col("part_key"),
        col("input_fingerprint"),
        col("rows_in"),
        coalesce(col("rows_out"), lit(0L)).as("rows_out"),
        lit(wallMs).as("wall_ms"),
        lit("ok").as("status")
      )
    manifestRows.write.mode("append").parquet(manifestPath)
    keys.size.toLong
  }
}
