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
}
