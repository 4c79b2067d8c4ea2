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

  /** Decode bound: a crafted header declaring huge dimensions would make
    * ImageIO allocate a W×H raster and die with OutOfMemoryError — an
    * *Error*, which no `catch Exception` sees — so dimensions are read from
    * the HEADER first (ImageReader.getWidth/getHeight decode no pixel data)
    * and anything above this pixel count degrades to the sentinel before a
    * raster is ever allocated. 2^26 px = 8192×8192 = 256 MiB of 4-byte
    * ARGB — far above any thumbnail-pipeline input, far below a task kill.
    */
  private val MaxDecodePixels = 1L << 26

  /** Full decode behind the header-dimension guard; null for unrecognized,
    * corrupt, or over-bound payloads — never a thrown Error.
    */
  private def safeDecode(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return null
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) null
          else reader.read(0)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => null }

  /** Real image decode: (width, height, sum of R+G+B over all pixels).
    * Undecodable payloads degrade to the sentinel (0, 0, -1) instead of
    * killing the task — binary columns are untrusted input, same stance as
    * the diff-walk's fuzz robustness. Decode goes through the header-guarded
    * `safeDecode`, so a crafted 60000×60000 header cannot OOM the executor.
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = safeDecode(bytes)
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
    // same stance as decodeImage: header-guarded decode — corrupt or
    // raster-bomb payloads degrade, they don't kill the task
    val img = safeDecode(bytes)
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

  // ----------------------------------------------------------------- audio

  final case class AudioMeta(
      media_id: Long,
      n_bytes: Long,
      is_wav: Boolean,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      duration_ms: Long
  )

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rdLe16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** A REAL (byte-valid) PCM WAV file, written by hand — RIFF/WAVE header,
    * 16-byte `fmt ` chunk, silent 16-bit `data` chunk. No audio library
    * needed; any standard WAV reader parses it.
    */
  def encodeWav(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    val dataBytes = nSamples * channels * 2
    val bos = new java.io.ByteArrayOutputStream(44 + dataBytes)
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(36 + dataBytes))
    bos.write("WAVE".getBytes("US-ASCII"))
    bos.write("fmt ".getBytes("US-ASCII")); bos.write(le32(16))
    bos.write(le16(1)) // PCM
    bos.write(le16(channels))
    bos.write(le32(sampleRate))
    bos.write(le32(sampleRate * channels * 2)) // byte rate
    bos.write(le16(channels * 2))              // block align
    bos.write(le16(16))                        // bits/sample
    bos.write("data".getBytes("US-ASCII")); bos.write(le32(dataBytes))
    bos.write(new Array[Byte](dataBytes))
    bos.toByteArray
  }

  /** Real RIFF/WAVE parse: (sampleRate, channels, nSamples), or the
    * (0, 0, -1) sentinel on anything that isn't a 16-bit PCM WAV — binary
    * columns are untrusted input (the decodeImage stance). A proper CHUNK
    * WALK, not a fixed-offset read: real-world PCM WAVs carry LIST/fact
    * chunks between `fmt ` and `data` (ffmpeg, Audacity), chunk sizes are
    * validated against the buffer before every read (a crafted fmt-length
    * cannot index out of bounds), and a lying declared data size is CLAMPED
    * to the bytes actually present so a 46-byte file can't claim hours of
    * audio. Any residual decode surprise degrades to the sentinel.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Long) = {
    val Sentinel = (0, 0, -1L)
    try {
      def ascii(o: Int, s: String) =
        o >= 0 && o + 4 <= bytes.length && new String(bytes, o, 4, "US-ASCII") == s
      if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return Sentinel
      var off = 12L
      var sampleRate = 0; var channels = 0; var bits = 0; var fmtSeen = false
      var dataBytes = -1L
      while (off + 8 <= bytes.length && dataBytes < 0) {
        val o = off.toInt
        val id = new String(bytes, o, 4, "US-ASCII")
        val size = rdLe32(bytes, o + 4)
        if (size < 0) return Sentinel
        if (id == "fmt ") {
          if (size < 16 || o + 8 + 16 > bytes.length) return Sentinel
          if (rdLe16(bytes, o + 8) != 1) return Sentinel // PCM only
          channels = rdLe16(bytes, o + 10)
          sampleRate = rdLe32(bytes, o + 12)
          bits = rdLe16(bytes, o + 22)
          fmtSeen = true
        } else if (id == "data") {
          dataBytes = math.min(size.toLong, bytes.length.toLong - o - 8)
        }
        off = off + 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      if (!fmtSeen || dataBytes < 0 || bits != 16 || channels <= 0 || sampleRate <= 0) Sentinel
      else (sampleRate, channels, dataBytes / (channels * 2))
    } catch { case _: Exception => Sentinel }
  }

  def isWav(bytes: Array[Byte]): Boolean = decodeWav(bytes)._3 >= 0

  /** Batch audio metadata over (media_id, audio binary): one narrow pass,
    * bytes never shuffle. duration_ms is exact integer math so the oracle
    * reproduces it.
    */
  def audioMeta(spark: SparkSession, audio: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    audio
      .select(col("media_id").cast("long"), col("audio"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (sr, ch, n) = decodeWav(bytes)
        val durMs = if (n < 0 || sr <= 0) -1L else n * 1000L / sr
        AudioMeta(id, bytes.length.toLong, n >= 0, sr, ch, n, durMs)
      })
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
