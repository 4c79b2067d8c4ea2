package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.Page

/** Multimodal column plumbing: images (and by extension audio/video frames)
  * as opaque `binary` columns with typed metadata. The decode is REAL —
  * `javax.imageio` ships in the JDK, so PNG encode/decode needs no external
  * dependency: fixtures are genuine PNG bytes and `decodeImage` reads actual
  * width/height/pixels back.
  *
  * At scale: binary payloads never become a shuffle key; metadata extraction
  * is a narrow per-partition map (the Scala analogue of a mapInPandas batch
  * UDF — same batch shape, same schema contract); downstream joins use only
  * the extracted metadata columns, so the heavy bytes stay columnar-pruned
  * out of every shuffle.
  */
object Multimodal {

  final case class ImageMeta(
      media_id: Long,
      n_bytes: Long,
      is_png: Boolean,
      width: Int,
      height: Int,
      px_sum: Long // sum of R+G+B over all pixels
  )

  private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Deterministic single-gray PNG: width×height, every pixel (gray, gray,
    * gray). PNG is lossless, so `decodeImage(encodePng(w, h, g))` returns
    * exactly (w, h, w*h*g*3) — the closed form the q33 oracle checks in SQL.
    */
  def encodePng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(width * height / 4 + 128)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real image decode: (width, height, sum of R+G+B over all pixels).
    * Undecodable payloads (ImageIO.read returns null) degrade to the
    * sentinel (0, 0, -1) instead of NPE-killing the task — binary columns
    * are untrusted input, same stance as the diff-walk's fuzz robustness.
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) return (0, 0, -1L)
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, sum)
  }

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && java.util.Arrays.equals(bytes.take(8), PngMagic)

  /** Batch metadata extraction over a (media_id, image binary) frame; one
    * pass per partition, no shuffle.
    */
  def imageMeta(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    media
      .select(col("media_id").cast("long"), col("image"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, s) = decodeImage(bytes)
        ImageMeta(id, bytes.length.toLong, isPng(bytes), w, h, s)
      })
  }

  /** Integer target dimensions of an aspect-preserving downscale to
    * `maxDim`: scale by maxDim/max(w,h) with floor division, clamped ≥ 1 —
    * closed-form on both engines, so the oracle reproduces the dims.
    * Images already within the bound are untouched.
    */
  def thumbDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxDim) (w, h)
    else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
  }

  /** REAL thumbnailing (decode → scale → re-encode): nearest-neighbor
    * scaling so a uniform image stays uniform — which makes even the
    * RESIZED pixel sum closed-form (tw·th·gray·3) on the uniform-gray
    * fixtures, i.e. the whole decode→resize→re-encode→decode loop is
    * oracle-checkable end-to-end (q71), not just spec'd. Undecodable input
    * degrades to the empty byte array (same untrusted-binary stance as
    * decodeImage).
    */
  def thumbnail(bytes: Array[Byte], maxDim: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    if (img == null) return Array.emptyByteArray
    val (tw, th) = thumbDims(img.getWidth, img.getHeight, maxDim)
    val out = new java.awt.image.BufferedImage(tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = out.createGraphics()
    try {
      g2.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g2.drawImage(img, 0, 0, tw, th, null)
    } finally g2.dispose()
    val bos = new java.io.ByteArrayOutputStream(tw * th / 4 + 128)
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Batch thumbnailing + verification metadata: for each (media_id, image),
    * the re-decoded thumbnail's dims and pixel sum. Narrow map; the binary
    * payloads never shuffle.
    */
  def thumbnailMeta(spark: SparkSession, media: DataFrame, maxDim: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    media
      .select(col("media_id").cast("long"), col("image"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val t = thumbnail(bytes, maxDim)
        val (w, h, s) = decodeImage(t)
        (id, t.length.toLong, w, h, s)
      })
      .toDF("media_id", "thumb_bytes", "thumb_w", "thumb_h", "thumb_px_sum")
  }

  /** Frame-sampling shape: split a binary payload into fixed-size "frames"
    * and emit every k-th — the row-explosion pattern (flatMap Generator) a
    * video pipeline needs.
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
