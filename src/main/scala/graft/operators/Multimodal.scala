package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Page

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side shape — schema, partition-preserving
  * batch processing via mapPartitions, metadata projection — is real and
  * tested; the codec step itself is STUBBED deterministically (this
  * container ships no image/audio libraries), clearly marked below.
  *
  * At scale: binary payloads never become a shuffle key; metadata extraction
  * is a narrow map; downstream joins use the extracted (url, meta) columns
  * only, so the heavy bytes stay columnar-pruned out of every shuffle.
  */
object Multimodal {

  final case class MediaMeta(
      url: String,
      n_bytes: Long,
      magic: String,
      width: Int,
      height: Int,
      feature_sum: Long
  )

  /** STUB decoder — deterministic fake standing in for a real image decode
    * (e.g. libjpeg). Derives "dimensions" and a "feature" from the bytes so
    * tests pin the plumbing; swap this single function for the real codec in
    * production.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val w = 16 + (sum % 64).toInt
    val h = 9 + (sum % 32).toInt
    (w, h, sum)
  }

  /** Batch metadata extraction over the binary column; one pass per
    * partition, no shuffle. (The Scala analogue of a mapInPandas batch UDF —
    * same batch shape, same schema contract.)
    */
  def extractMeta(spark: SparkSession, pages: Dataset[Page]): Dataset[MediaMeta] = {
    import spark.implicits._
    pages.mapPartitions(_.map { p =>
      val (w, h, f) = decodeStub(p.html)
      val magic = p.html.take(9).map(b => (b & 0xff).toChar).mkString
      MediaMeta(p.url, p.html.length.toLong, magic, w, h, f)
    })
  }

  /** Frame-sampling shape: split a binary payload into fixed-size "frames"
    * and emit every k-th — the row-explosion pattern (flatMap Generator) a
    * video pipeline needs, with deterministic fake frames.
    */
  def sampleFrames(
      spark: SparkSession,
      pages: Dataset[Page],
      frameBytes: Int = 256,
      everyK: Int = 4
  ): DataFrame = {
    import spark.implicits._
    pages
      .flatMap { p =>
        p.html.grouped(frameBytes).zipWithIndex.collect {
          case (frame, idx) if idx % everyK == 0 =>
            (p.url, idx, frame.length, frame.map(b => (b & 0xff).toLong).sum)
        }
      }
      .toDF("url", "frame_idx", "frame_bytes", "frame_checksum")
  }
}
