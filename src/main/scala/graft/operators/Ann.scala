package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Sketches

/** Similarity search over an embedding column (`Array[Float]`).
  *
  *  - bruteForceTopK: exact cosine top-k against one query vector — a single
  *    narrow map + TakeOrderedAndProject; the baseline and the verifier.
  *  - lshTopK: random-hyperplane LSH buckets (SimHash for vectors) — the
  *    scale path: each query probes only its bucket (and neighbors), so the
  *    scored set is a small fraction of the corpus. Buckets are a plain
  *    groupable column ⇒ co-located joins, no custom physical operator.
  *  - nearDupPairs: embedding-cosine near-duplicate detection via the same
  *    bucket join shape as Dedup.minHashCandidates.
  */
object Ann {

  /** Deterministic random hyperplanes (seeded), dim × nPlanes. */
  def hyperplanes(dim: Int, nPlanes: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(7)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  def signBits(v: Array[Float], planes: Array[Array[Double]]): Long = {
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      var dot = 0.0
      var i = 0
      val pl = planes(p)
      while (i < v.length && i < pl.length) { dot += v(i) * pl(i); i += 1 }
      if (dot >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Exact top-k by cosine against `query`. Deterministic tiebreak on id.
    * The per-row score is a narrow map; ordering uses scaled-integer cosine
    * components so results are bit-stable (see Sketches.scaledDot).
    */
  def bruteForceTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int
  ): DataFrame = {
    import spark.implicits._
    val q = spark.sparkContext.broadcast(query)
    embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, Sketches.cosine(v, q.value)) }
      .toDF("id", "cosine")
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** Bucketed ANN: assign every vector (and the query) a hyperplane
    * signature; scan only vectors sharing the signature bucket or differing
    * in ≤ 1 bit (multi-probe). Falls back to fewer results if the bucket is
    * sparse — standard recall/cost tradeoff.
    */
  def lshTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nPlanes: Int = 12
  ): DataFrame = {
    import spark.implicits._
    val dim = query.length
    val planes = spark.sparkContext.broadcast(hyperplanes(dim, nPlanes))
    val qSig = signBits(query, planes.value)
    val probes = (qSig +: (0 until nPlanes).map(b => qSig ^ (1L << b))).toSet
    val probesB = spark.sparkContext.broadcast(probes)
    val q = spark.sparkContext.broadcast(query)
    embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val pl = planes.value; val pr = probesB.value; val qv = q.value
        it.flatMap { case (id, v) =>
          if (pr.contains(signBits(v, pl))) Some((id, Sketches.cosine(v, qv))) else None
        }
      }
      .toDF("id", "cosine")
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs, banded like Dedup.simHashPairs.
    *
    * The hyperplane signature is split into `bands` independent bands of
    * `bandBits` bits; a pair is a candidate if ANY band matches. Per-bit
    * agreement for angle θ is 1−θ/π, so at cosine 0.95 (θ≈0.318 rad,
    * p≈0.899) recall is 1−(1−p^4)^6 ≈ 0.998 with the defaults — vs ≈28%
    * for the single 12-plane bucket this replaces. Only (id, band, key)
    * rides the bucket self-join and pair-dedup shuffles; the float vectors
    * are joined back once per SURVIVING candidate pair for exact cosine
    * verification (the ids-only discipline of Dedup.minHashCandidates) — at
    * 100 TB the wide ops move ~24 B/row instead of the embedding payload.
    * Empty input returns an empty frame instead of failing the dim probe.
    */
  def nearDupPairs(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double = 0.95,
      bands: Int = 6,
      bandBits: Int = 4
  ): DataFrame = {
    import spark.implicits._
    require(bands * bandBits <= 64, "signature must fit in a Long")
    val ids = embeddings.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val firstVec = ids.select(col("v")).as[Array[Float]].take(1)
    if (firstVec.isEmpty)
      return spark.emptyDataset[(Long, Long, Double)].toDF("id1", "id2", "cosine")
    val planes = spark.sparkContext.broadcast(hyperplanes(firstVec.head.length, bands * bandBits))
    val mask = (1L << bandBits) - 1
    val banded = ids
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val bits = signBits(v, planes.value)
        (0 until bands).map(b => (id, b, (bits >>> (b * bandBits)) & mask))
      }
      .toDF("id", "band", "bkey")
    val l = banded.select(col("band"), col("bkey"), col("id").as("id1"))
    val r = banded.select(col("band"), col("bkey"), col("id").as("id2"))
    val pairs = l.join(r, Seq("band", "bkey"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .dropDuplicates("id1", "id2")
    val v1 = ids.select(col("id").as("id1"), col("v").as("v1"))
    val v2 = ids.select(col("id").as("id2"), col("v").as("v2"))
    pairs
      .join(v1, Seq("id1"))
      .join(v2, Seq("id2"))
      .select(col("id1"), col("id2"), col("v1"), col("v2"))
      .as[(Long, Long, Array[Float], Array[Float])]
      .map { case (a, b, x, y) => (a, b, Sketches.cosine(x, y)) }
      .toDF("id1", "id2", "cosine")
      .filter(col("cosine") >= minCosine)
  }

  // ------------------------------------------------- oracle-gated variants
  //
  // The Gaussian-plane LSH and Lloyd-trained IVF above are the production
  // forms (spec-gated: recall vs brute force, full-probe == brute). The
  // variants below swap ONLY the randomness for closed-form integers from
  // fnv1a and run every comparison in exact scaled-integer arithmetic —
  // bucket membership, cell assignment, probe sets, and scores all become
  // SQL-expressible, so a DuckDB oracle reproduces the EXACT scan set and
  // hash-gates the whole probe machinery (q37/q47). Same plan shape, same
  // 100×-scale properties; only the constants differ.

  /** Closed-form integer hyperplanes: plane p component i =
    * fnv1a("plane:p:i") mod 2001 − 1000 ∈ [−1000, 1000].
    */
  def intPlanes(dim: Int, nPlanes: Int): Array[Array[Long]] =
    Array.tabulate(nPlanes)(p =>
      Array.tabulate(dim)(i => math.floorMod(Sketches.fnv1a(s"plane:$p:$i"), 2001L) - 1000L))

  /** Milli-scaled vector components: a_i = floor(v_i · 1000) — the exact
    * integer domain every gate-variant comparison runs in (floor matches
    * SQL floor; float→double widening is exact on both engines).
    */
  def milliScaled(v: Array[Float]): Array[Long] = {
    val a = new Array[Long](v.length)
    var i = 0
    while (i < v.length) { a(i) = math.floor(v(i) * 1000.0).toLong; i += 1 }
    a
  }

  /** Sign bits over integer planes: bit p set iff Σ a_i·c_{p,i} ≥ 0. */
  def signBitsInt(a: Array[Long], planes: Array[Array[Long]]): Long = {
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      var dot = 0L
      var i = 0
      val pl = planes(p)
      while (i < a.length && i < pl.length) { dot += a(i) * pl(i); i += 1 }
      if (dot >= 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Oracle-gated LSH top-k: integer-plane signatures, candidate iff the
    * signature is within Hamming 1 of the query's (the same multiprobe set
    * as lshTopK), scored with the exact scaled-integer dot. Identical scan
    * shape to lshTopK — narrow filter + TakeOrderedAndProject.
    */
  def lshTopKGate(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nPlanes: Int = 5
  ): DataFrame = {
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(intPlanes(query.length, nPlanes))
    val qSig = signBitsInt(milliScaled(query), planes.value)
    val q = spark.sparkContext.broadcast(query)
    embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val pl = planes.value; val qv = q.value
        it.flatMap { case (id, v) =>
          val sig = signBitsInt(milliScaled(v), pl)
          if (java.lang.Long.bitCount(sig ^ qSig) <= 1)
            Some((id, Sketches.scaledDot(v, qv)))
          else None
        }
      }
      .toDF(idCol, "scaled_dot")
      .orderBy(col("scaled_dot").desc, col(idCol).asc)
      .limit(k)
  }

  /** Closed-form integer centroids on the milli scale: cell c component i =
    * fnv1a("centroid:c:i") mod 2001 − 1000.
    */
  def intCentroids(dim: Int, nCells: Int): Array[Array[Long]] =
    Array.tabulate(nCells)(c =>
      Array.tabulate(dim)(i => math.floorMod(Sketches.fnv1a(s"centroid:$c:$i"), 2001L) - 1000L))

  /** Cell ranking for the gate variant: argmin over c of ‖a − x_c‖² with
    * lowest-index tiebreak, computed as score_c = Σx_c² − 2·(a·x_c) (the
    * Σa_i² term is constant per vector, so the argmin — and every tie — is
    * unchanged; this keeps the SQL oracle a single 64-term dot per cell).
    * Returns cell indices best-first.
    */
  def rankCellsInt(a: Array[Long], cents: Array[Array[Long]]): Array[Int] = {
    val scores = Array.tabulate(cents.length) { c =>
      val x = cents(c)
      var sx2 = 0L; var dot = 0L
      var i = 0
      while (i < x.length) {
        sx2 += x(i) * x(i)
        if (i < a.length) dot += a(i) * x(i)
        i += 1
      }
      sx2 - 2 * dot
    }
    cents.indices.sortBy(c => (scores(c), c)).toArray
  }

  /** Oracle-gated IVF top-k: closed-form centroids, distributed integer
    * assignment, nProbe-cell scan, exact scaled-integer scoring — the same
    * assign→probe→scan plan as ivfTopK with every step SQL-reproducible.
    */
  def ivfTopKGate(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    import spark.implicits._
    val cents = spark.sparkContext.broadcast(intCentroids(query.length, nCells))
    val probe = rankCellsInt(milliScaled(query), cents.value).take(nProbe).toSet
    val probeB = spark.sparkContext.broadcast(probe)
    val q = spark.sparkContext.broadcast(query)
    embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = cents.value; val pr = probeB.value; val qv = q.value
        it.flatMap { case (id, v) =>
          if (pr.contains(rankCellsInt(milliScaled(v), cs)(0)))
            Some((id, Sketches.scaledDot(v, qv)))
          else None
        }
      }
      .toDF(idCol, "scaled_dot")
      .orderBy(col("scaled_dot").desc, col(idCol).asc)
      .limit(k)
  }

  /** Scalar (int8) quantization — the memory/IO lever at 100 TB: a 64-dim
    * float32 vector is 256 B; quantized it's 64 B, so a scan reads 4× less
    * and the hot set fits 4× more vectors per executor. q_i =
    * clamp(floor(v_i·127), −127, 127) — floor (not round) so Spark and the
    * SQL oracle agree bit-for-bit, clamp keeps the product sum far inside
    * Long range.
    */
  def quantizeInt8(v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](v.length)
    var i = 0
    while (i < v.length) {
      val q = math.floor(v(i) * 127.0).toLong
      out(i) = math.max(-127L, math.min(127L, q)).toByte
      i += 1
    }
    out
  }

  /** Integer dot over quantized vectors. */
  def dotInt8(a: Array[Byte], b: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length && i < b.length) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }

  /** Quantized brute-force top-k: quantize corpus and query to int8, score
    * with the exact integer dot, deterministic (score desc, id) order. At
    * scale the corpus would be stored pre-quantized (a 64 B binary column)
    * and this becomes a pure scan-side kernel; recall vs the float scorer
    * is spec-asserted, exact agreement is oracle-gated (quantization is
    * floor/clamp arithmetic the SQL oracle reproduces).
    */
  def int8TopK(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int
  ): DataFrame = {
    import spark.implicits._
    val qq = spark.sparkContext.broadcast(quantizeInt8(query))
    embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val q = qq.value
        it.map { case (id, v) => (id, dotInt8(quantizeInt8(v), q)) }
      }
      .toDF(idCol, "int8_dot")
      .orderBy(col("int8_dot").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path alongside
    * LSH: k-means centroids trained on a bounded driver-side sample
    * (deterministic seeded Lloyd iterations; at 100 TB this step is MLlib
    * KMeans over a sample table — the 5-line swap is the trainer only),
    * centroids broadcast, every vector assigned to its nearest centroid (a
    * narrow map), and a query scans ONLY the `nProbe` nearest cells —
    * corpus-fraction scanned ≈ nProbe/k instead of 1.
    */
  object Ivf {
    final case class Model(centroids: Array[Array[Float]]) {
      def assign(v: Array[Float]): Int = {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          var d = 0.0; var i = 0
          val ct = centroids(c)
          while (i < v.length && i < ct.length) { val t = v(i) - ct(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
      def nearestCells(q: Array[Float], nProbe: Int): Array[Int] =
        centroids.indices.sortBy { c =>
          var d = 0.0; var i = 0
          val ct = centroids(c)
          while (i < q.length && i < ct.length) { val t = q(i) - ct(i); d += t * t; i += 1 }
          d
        }.take(nProbe).toArray
    }

    /** Deterministic Lloyd training on a bounded sample: init = the k
      * lowest-id vectors, fixed iteration count, stable tie-breaks.
      */
    def train(sample: Seq[Array[Float]], k: Int, iters: Int = 5): Model = {
      require(sample.nonEmpty, "empty training sample")
      var m = Model(sample.take(k).toArray)
      (1 to iters).foreach { _ =>
        val dim = sample.head.length
        val sums = Array.fill(m.centroids.length)(new Array[Double](dim))
        val counts = new Array[Long](m.centroids.length)
        sample.foreach { v =>
          val c = m.assign(v)
          counts(c) += 1
          var i = 0
          while (i < dim) { sums(c)(i) += v(i); i += 1 }
        }
        m = Model(m.centroids.indices.map { c =>
          if (counts(c) == 0) m.centroids(c) // keep empty cells stable
          else sums(c).map(x => (x / counts(c)).toFloat)
        }.toArray)
      }
      m
    }
  }

  /** IVF top-k: train on the first `sampleN` vectors by id (bounded driver
    * pull), assign distributed, scan only the probed cells.
    */
  def ivfTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      sampleN: Int = 10000
  ): DataFrame = {
    import spark.implicits._
    val sample = embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .orderBy(col(idCol).asc) // deterministic sample
      .limit(sampleN)
      .collect()
      .map(_._2)
    val model = spark.sparkContext.broadcast(Ivf.train(sample.toSeq, nCells))
    val probe = model.value.nearestCells(query, nProbe).toSet
    val probeB = spark.sparkContext.broadcast(probe)
    val q = spark.sparkContext.broadcast(query)
    embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val m = model.value; val pr = probeB.value; val qv = q.value
        it.flatMap { case (id, v) =>
          if (pr.contains(m.assign(v))) Some((id, Sketches.cosine(v, qv))) else None
        }
      }
      .toDF("id", "cosine")
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  /** Window top-k per probe group — the generic "k nearest per query" shape
    * for batched multi-query search (Window.partitionBy(query).orderBy desc).
    */
  def topKPerGroup(scored: DataFrame, groupCol: String, scoreCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).desc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Typed bounded-buffer top-k per group — the 100×-scale form of
    * topKPerGroup: a map-side-combining `Aggregator[ScoredId, List, Seq]`
    * (the Linking.TopKQids pattern), so the group shuffle moves at most k
    * scored rows per (query, map partition) instead of every scored corpus
    * row. Same output rows and rank order (score desc, id asc) as the
    * window form — proven equal in OperatorsSpec; partial/final
    * ObjectHashAggregate asserted in PlanSpec.
    */
  final case class ScoredId(id: Long, score: Long)

  class TopKIds(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
    private def better(a: ScoredId, b: ScoredId): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    private def insert(buf: List[ScoredId], v: ScoredId): List[ScoredId] = {
      val (pre, post) = buf.span(b => better(b, v))
      val merged = pre ::: v :: post
      if (merged.length > k) merged.take(k) else merged
    }
    def zero: List[ScoredId] = Nil
    def reduce(buf: List[ScoredId], v: ScoredId): List[ScoredId] = insert(buf, v)
    def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] = b.foldLeft(a)(insert)
    def finish(buf: List[ScoredId]): Seq[ScoredId] = buf
    def bufferEncoder: org.apache.spark.sql.Encoder[List[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredId]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Aggregator-based top-k per group: identical rows/columns to
    * topKPerGroup (groupCol, idCol, scoreCol, rank), different physical
    * shape (partial + final agg, ≤ k rows per group cross the shuffle).
    */
  def topKPerGroupAgg(scored: DataFrame, groupCol: String, scoreCol: String, idCol: String, k: Int): DataFrame = {
    val fn = org.apache.spark.sql.functions.udaf(
      new TopKIds(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[ScoredId]())
    scored
      .groupBy(col(groupCol))
      .agg(fn(col(idCol), col(scoreCol)).as("topk"))
      .select(col(groupCol), posexplode(col("topk")).as(Seq("rank0", "hit")))
      .select(
        col(groupCol),
        col("hit.id").as(idCol),
        col("hit.score").as(scoreCol),
        (col("rank0") + 1).cast("int").as("rank"))
  }
}
