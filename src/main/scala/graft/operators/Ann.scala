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
    val banded = hyperBandKeys(spark, ids, planes, bands, bandBits)
    val l = banded.select(col("band"), col("bkey"), col("id").as("id1"))
    val r = banded.select(col("band"), col("bkey"), col("id").as("id2"))
    val pairs = l.join(r, Seq("band", "bkey"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      // width-controlled pair-dedup exchange (the Dedup.minHashCandidates
      // discipline): keeps the CPU-bound cosine-verify stage core-parallel
      // instead of byte-coalesced, at the same single exchange
      .transform(Dedup.pairParallelism(spark, _))
      .dropDuplicates("id1", "id2")
    cosineVerified(spark, ids, pairs, minCosine)
  }

  /** Banded (id, band, bkey) rows over the hyperplane signature — shared by
    * the full and incremental near-dup paths (the Dedup.banded twin for the
    * embedding family).
    */
  private def hyperBandKeys(
      spark: SparkSession,
      ids: DataFrame,
      planes: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      bands: Int,
      bandBits: Int
  ): DataFrame = {
    import spark.implicits._
    val mask = (1L << bandBits) - 1
    ids
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val bits = signBits(v, planes.value)
        (0 until bands).map(b => (id, b, (bits >>> (b * bandBits)) & mask))
      }
      .toDF("id", "band", "bkey")
  }

  /** The exact-cosine verification tail shared by both near-dup paths:
    * vectors join back ONLY for surviving candidate pairs.
    */
  private def cosineVerified(
      spark: SparkSession,
      ids: DataFrame,
      pairs: DataFrame,
      minCosine: Double
  ): DataFrame = {
    val v1 = ids.select(col("id").as("id1"), col("v").as("v1"))
    val v2 = ids.select(col("id").as("id2"), col("v").as("v2"))
    // exact cosine as a NATIVE codegen expression over columnar ArrayData
    // (graft.plans.CosineExpr — the SigAgreeExpr discipline): the typed
    // .map deserialized both float vectors per surviving pair through an
    // object fence; this keeps join → score → filter one codegen span with
    // zero per-pair allocation. Bit-identical to Sketches.cosine
    // (CosineExprSpec; q38/q90 oracle hashes pin it end-to-end).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_fast",
      exprs => graft.plans.CosineExpr(exprs.head, exprs(1)),
      "built-in")
    pairs
      .join(v1, Seq("id1"))
      .join(v2, Seq("id2"))
      .select(col("id1"), col("id2"), expr("cosine_fast(v1, v2)").as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Incremental embedding near-dup after a corpus append — the
    * `minHashCandidatesIncremental` contract for the embedding family: band
    * ONLY the new batch against the full corpus's band keys and emit
    * (cosine-verified) pairs touching at least one new vector; old-old
    * pairs were produced by earlier runs. union(previous pairs, this) ==
    * nearDupPairs over the full corpus.
    *
    * Cost honesty (the minhash path's caveat applies here too): what this
    * makes append-bounded is the PAIR/VERIFY volume (bounded by the
    * append's collision surface, never all-pairs). The corpus side still
    * recomputes signBits signatures from the raw vectors each run — a
    * corpus-linear narrow pass. When that matters, materialize the band
    * keys once and append per batch (the `Dedup.writeBandLayout` pattern —
    * same (id, band, bkey) shape, so the bucket-partitioned layout and its
    * file pruning carry over unchanged); the spec's equality contract is
    * the same either way.
    */
  def nearDupPairsIncremental(
      spark: SparkSession,
      allEmbeddings: DataFrame,
      newEmbeddings: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double = 0.95,
      bands: Int = 6,
      bandBits: Int = 4
  ): DataFrame = {
    import spark.implicits._
    require(bands * bandBits <= 64, "signature must fit in a Long")
    val all = allEmbeddings.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val nw = newEmbeddings.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val firstVec = all.select(col("v")).as[Array[Float]].take(1)
    if (firstVec.isEmpty)
      return spark.emptyDataset[(Long, Long, Double)].toDF("id1", "id2", "cosine")
    val planes = spark.sparkContext.broadcast(hyperplanes(firstVec.head.length, bands * bandBits))
    val bNew = hyperBandKeys(spark, nw, planes, bands, bandBits)
      .select(col("band"), col("bkey"), col("id").as("idn"))
    val bAll = hyperBandKeys(spark, all, planes, bands, bandBits)
      .select(col("band"), col("bkey"), col("id").as("ida"))
    val pairs = bNew.join(bAll, Seq("band", "bkey"))
      .filter(col("idn") =!= col("ida"))
      .select(
        least(col("idn"), col("ida")).as("id1"),
        greatest(col("idn"), col("ida")).as("id2"))
      .transform(Dedup.pairParallelism(spark, _))
      .dropDuplicates("id1", "id2")
    cosineVerified(spark, all, pairs, minCosine)
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

  // ----------------------------------------------- physical-layout variants
  //
  // Every probe path above prunes COMPUTE (rows scored) but still READS the
  // whole corpus — at 100 TB the win must come from pruning IO. These
  // operators materialize the corpus in a probe-friendly physical layout
  // once (a write-side cost amortized over every query), after which the
  // probe set prunes FILES at the scan:
  //  - ivfWriteLayoutGate / ivfTopKPartitioned: embeddings partitioned by
  //    assigned cell id → a query reads only nProbe of nCells partition
  //    directories (partition pruning, PlanSpec-asserted).
  //  - int8WriteLayout / int8TopKStored: the quantized vector stored as a
  //    64 B binary column → every scan reads ~4× fewer bytes than float32.
  //  - pqWriteLayout / pqTopKStored: 8 PQ codes stored per vector (8 B) →
  //    ~32× fewer scan bytes, scored by ADC table lookup.
  // Parquet partition dirs/columns stand in for Iceberg partition transforms
  // (the KgPipeline.materializeGraph convention); the gate constants are the
  // closed-form fnv1a family so every layout is DuckDB-reproducible from the
  // float source.

  /** Cell-assigned form of an embeddings batch (None when empty): the
    * shared narrow map behind both the full layout build and incremental
    * append — assignment is a pure function of the vector, so a vector
    * lands in the SAME cell whether written at build time or appended
    * later (what makes append correct without touching existing files).
    */
  private def ivfAssigned(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int
  ): Option[DataFrame] = {
    import spark.implicits._
    val first = embeddings.select(col(vecCol)).as[Array[Float]].take(1)
    if (first.isEmpty) return None
    val cents = spark.sparkContext.broadcast(intCentroids(first.head.length, nCells))
    Some(embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = cents.value
        it.map { case (id, v) => (id, v, rankCellsInt(milliScaled(v), cs)(0)) }
      }
      .toDF(idCol, vecCol, "cell"))
  }

  /** Materialize embeddings physically partitioned by gate-centroid cell id:
    * assignment is a narrow map (no shuffle — each write task writes its
    * rows into the partition dirs it holds); the layout is deterministic
    * from the source table, so rebuild-vs-reuse is a pure cost decision.
    */
  def ivfWriteLayoutGate(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nCells: Int = 16
  ): Unit =
    ivfAssigned(spark, embeddings, idCol, vecCol, nCells).foreach { df =>
      graft.sources.Tables.format.writePartitioned(df, path, "cell")
      graft.sources.Tables.writeLayoutMeta(spark, path, "n_cells" -> nCells)
      graft.sources.Tables.recordLayoutLineage(path, "build", embeddings, idCol)
    }

  /** Incremental refresh of a cell-partitioned layout: assign the NEW
    * vectors (same closed-form centroids — appended rows land in the same
    * cells a full rebuild would put them in) and append their files into
    * the existing partition dirs. Existing files are untouched, probes
    * prune exactly as before, and the lineage log records the batch — the
    * daily-growth lifecycle of a 100 TB index without a rebuild.
    */
  def ivfAppendLayout(
      spark: SparkSession,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nCells: Int = 16
  ): Unit =
    ivfAssigned(spark, newVectors, idCol, vecCol, nCells).foreach { df =>
      graft.sources.Tables.requireLayoutMeta(spark, path, "n_cells" -> nCells)
      graft.sources.Tables.format.appendPartitioned(df, path, "cell")
      graft.sources.Tables.recordLayoutLineage(path, "append", newVectors, idCol)
    }

  /** Probe-limited IVF over the cell-partitioned layout: the `cell IN
    * (probe set)` predicate is a PARTITION filter, so the scan lists and
    * reads only nProbe of nCells directories — corpus-fraction READ (not
    * just scored) ≈ nProbe/nCells. Same rows as ivfTopKGate (q47's oracle
    * gates it via identical SQL).
    */
  def ivfTopKPartitioned(
      spark: SparkSession,
      layoutPath: String,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.requireLayoutMeta(spark, layoutPath, "n_cells" -> nCells)
    val cents = intCentroids(query.length, nCells)
    val probe = rankCellsInt(milliScaled(query), cents).take(nProbe).toSeq
    val q = spark.sparkContext.broadcast(query)
    spark.read.parquet(layoutPath)
      .filter(col("cell").isin(probe.map(Int.box): _*))
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, Sketches.scaledDot(v, q.value)) }
      .toDF(idCol, "scaled_dot")
      .orderBy(col("scaled_dot").desc, col(idCol).asc)
      .limit(k)
  }

  /** Materialize embeddings physically partitioned by LSH bucket (the full
    * integer-plane signature, 0..2^nPlanes−1) — the LSH twin of
    * ivfWriteLayoutGate: assignment is a narrow map at write time, and the
    * Hamming≤1 multiprobe set becomes a partition filter at query time.
    */
  def lshWriteLayoutGate(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nPlanes: Int = 5
  ): Unit =
    lshAssigned(spark, embeddings, idCol, vecCol, nPlanes).foreach { df =>
      graft.sources.Tables.format.writePartitioned(df, path, "bucket")
      graft.sources.Tables.writeLayoutMeta(spark, path, "n_planes" -> nPlanes)
      graft.sources.Tables.recordLayoutLineage(path, "build", embeddings, idCol)
    }

  /** Bucket-assigned form of an embeddings batch — the ivfAssigned twin for
    * the hyperplane family.
    */
  private def lshAssigned(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int
  ): Option[DataFrame] = {
    import spark.implicits._
    val first = embeddings.select(col(vecCol)).as[Array[Float]].take(1)
    if (first.isEmpty) return None
    val planes = spark.sparkContext.broadcast(intPlanes(first.head.length, nPlanes))
    Some(embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val pl = planes.value
        it.map { case (id, v) => (id, v, signBitsInt(milliScaled(v), pl)) }
      }
      .toDF(idCol, vecCol, "bucket"))
  }

  /** Incremental refresh of the bucket-partitioned layout (see
    * ivfAppendLayout — same lifecycle, hyperplane-bucket partitioning).
    */
  def lshAppendLayout(
      spark: SparkSession,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nPlanes: Int = 5
  ): Unit =
    lshAssigned(spark, newVectors, idCol, vecCol, nPlanes).foreach { df =>
      graft.sources.Tables.requireLayoutMeta(spark, path, "n_planes" -> nPlanes)
      graft.sources.Tables.format.appendPartitioned(df, path, "bucket")
      graft.sources.Tables.recordLayoutLineage(path, "append", newVectors, idCol)
    }

  /** Probe-limited LSH over the bucket-partitioned layout: the query's
    * Hamming≤1 probe set (nPlanes+1 of 2^nPlanes buckets) prunes partition
    * directories at the scan — same rows as lshTopKGate (q37's oracle gates
    * it via identical SQL), but the corpus fraction READ ≈ (nPlanes+1)/2^nPlanes.
    */
  def lshTopKPartitioned(
      spark: SparkSession,
      layoutPath: String,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nPlanes: Int = 5
  ): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.requireLayoutMeta(spark, layoutPath, "n_planes" -> nPlanes)
    val planes = intPlanes(query.length, nPlanes)
    val qSig = signBitsInt(milliScaled(query), planes)
    val probes = (qSig +: (0 until nPlanes).map(b => qSig ^ (1L << b))).distinct
    val q = spark.sparkContext.broadcast(query)
    spark.read.parquet(layoutPath)
      .filter(col("bucket").isin(probes.map(Long.box): _*))
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, Sketches.scaledDot(v, q.value)) }
      .toDF(idCol, "scaled_dot")
      .orderBy(col("scaled_dot").desc, col(idCol).asc)
      .limit(k)
  }

  /** Materialize the int8-quantized corpus: (id, qvec BINARY). Parquet
    * stores the quantized vector as a 64 B byte array vs 256 B of float32 —
    * the 4×-less-IO claim is about THIS stored column, size-ratio-asserted
    * in AnnSpec against the float layout.
    */
  def int8WriteLayout(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      path: String
  ): Unit = {
    if (embeddings.take(1).isEmpty) return
    graft.sources.Tables.format.write(int8Quantized(spark, embeddings, idCol, vecCol), path)
    graft.sources.Tables.recordLayoutLineage(path, "build", embeddings, idCol)
  }

  private def int8Quantized(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String
  ): DataFrame = {
    import spark.implicits._
    embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, quantizeInt8(v)) }
      .toDF(idCol, "qvec")
  }

  /** Incremental refresh of the stored-int8 layout: quantize the new batch
    * (same closed-form quantizer) and append.
    */
  def int8AppendLayout(
      spark: SparkSession,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String
  ): Unit = {
    if (newVectors.take(1).isEmpty) return // the None guard of the siblings
    graft.sources.Tables.format.append(int8Quantized(spark, newVectors, idCol, vecCol), path)
    graft.sources.Tables.recordLayoutLineage(path, "append", newVectors, idCol)
  }

  /** Brute-force top-k over the STORED int8 column: the scan reads the 64 B
    * qvec, never the float vector. Rows equal int8TopK's (quantization is
    * deterministic), so q60's closed-form SQL oracle gates this path too.
    */
  def int8TopKStored(
      spark: SparkSession,
      layoutPath: String,
      idCol: String,
      query: Array[Float],
      k: Int
  ): DataFrame = {
    import spark.implicits._
    val qq = spark.sparkContext.broadcast(quantizeInt8(query))
    spark.read.parquet(layoutPath)
      .select(col(idCol).cast("long"), col("qvec"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val q = qq.value
        it.map { case (id, qv) => (id, dotInt8(qv, q)) }
      }
      .toDF(idCol, "int8_dot")
      .orderBy(col("int8_dot").desc, col(idCol).asc)
      .limit(k)
  }

  /** Native-codegen form of int8TopKStored: scoring via the Int8DotExpr
    * Catalyst expression (binary columns are `byte[]` in generated code),
    * so scan → score → TakeOrderedAndProject is ONE fused codegen stage
    * with no object ser/deser fence — the production shape of the
    * stored-quantized scan. Query vector rides as a SQL binary literal.
    * Row-equal to the typed form (PlanSpec) and gated by q60's oracle.
    */
  def int8TopKStoredNative(
      spark: SparkSession,
      layoutPath: String,
      idCol: String,
      query: Array[Float],
      k: Int
  ): DataFrame = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "int8_dot_fast",
      exprs => graft.plans.Int8DotExpr(exprs.head, exprs(1)),
      "built-in")
    val qhex = quantizeInt8(query).map(b => f"${b & 0xff}%02X").mkString
    spark.read.parquet(layoutPath)
      .select(
        col(idCol).cast("long"),
        expr(s"int8_dot_fast(qvec, X'$qhex')").as("int8_dot"))
      .orderBy(col("int8_dot").desc, col(idCol).asc)
      .limit(k)
  }

  // ------------------------------------------------- product quantization

  /** Closed-form PQ codebooks on the milli scale: subspace s (of m), codeword
    * c (of kw), component j (of dim/m) = fnv1a("pq:s:c:j") mod 2001 − 1000 —
    * the same fnv1a family as the LSH planes / IVF centroids, so assignment
    * and ADC scoring are exactly SQL-expressible (q62's oracle).
    * Returns [m][kw][subDim].
    */
  def pqCodebooks(dim: Int, m: Int, kw: Int): Array[Array[Array[Long]]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    Array.tabulate(m)(s => Array.tabulate(kw)(c =>
      Array.tabulate(subDim)(j => math.floorMod(Sketches.fnv1a(s"pq:$s:$c:$j"), 2001L) - 1000L)))
  }

  /** Per-subspace nearest-codeword assignment of a milli-scaled vector:
    * argmin ‖a_sub − x‖² via the same reduced score Σx² − 2·a_sub·x (the
    * Σa² term is subspace-constant), lowest-index tiebreak. One byte per
    * subspace — the stored representation.
    */
  def pqAssign(a: Array[Long], books: Array[Array[Array[Long]]]): Array[Byte] = {
    val m = books.length
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val subDim = books(s)(0).length
      val off = s * subDim
      var bestC = 0
      var bestScore = Long.MaxValue
      var c = 0
      while (c < books(s).length) {
        val x = books(s)(c)
        var sx2 = 0L; var dot = 0L
        var j = 0
        while (j < subDim) {
          sx2 += x(j) * x(j)
          if (off + j < a.length) dot += a(off + j) * x(j)
          j += 1
        }
        val score = sx2 - 2 * dot
        if (score < bestScore) { bestScore = score; bestC = c }
        c += 1
      }
      out(s) = bestC.toByte
      s += 1
    }
    out
  }

  /** ADC (asymmetric distance computation) lookup table for one query:
    * qtab[s][c] = q_sub(milli) · codeword(s, c) — m×kw Longs, built once on
    * the driver and broadcast; per-vector scoring is then m table lookups.
    */
  def pqQueryTable(query: Array[Float], books: Array[Array[Array[Long]]]): Array[Array[Long]] = {
    val qm = milliScaled(query)
    books.zipWithIndex.map { case (book, s) =>
      val subDim = book(0).length
      val off = s * subDim
      book.map { x =>
        var dot = 0L
        var j = 0
        while (j < subDim) {
          if (off + j < qm.length) dot += qm(off + j) * x(j)
          j += 1
        }
        dot
      }
    }
  }

  /** Materialize PQ codes: (id, codes BINARY of m bytes) — 8 B per vector at
    * the defaults vs 256 B float32, a ~32× scan-IO reduction for query-time
    * scoring (assignment cost is paid once at write).
    */
  def pqWriteLayout(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      m: Int = 8,
      kw: Int = 16
  ): Unit =
    pqCoded(spark, embeddings, idCol, vecCol, m, kw).foreach { df =>
      graft.sources.Tables.format.write(df, path)
      graft.sources.Tables.writeLayoutMeta(spark, path, "m" -> m, "kw" -> kw)
      graft.sources.Tables.recordLayoutLineage(path, "build", embeddings, idCol)
    }

  private def pqCoded(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      kw: Int
  ): Option[DataFrame] = {
    import spark.implicits._
    val first = embeddings.select(col(vecCol)).as[Array[Float]].take(1)
    if (first.isEmpty) return None
    val books = spark.sparkContext.broadcast(pqCodebooks(first.head.length, m, kw))
    Some(embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val b = books.value
        it.map { case (id, v) => (id, pqAssign(milliScaled(v), b)) }
      }
      .toDF(idCol, "codes"))
  }

  /** Incremental refresh of the stored-codes layout: encode the new batch
    * with the same closed-form codebooks and append.
    */
  def pqAppendLayout(
      spark: SparkSession,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      m: Int = 8,
      kw: Int = 16
  ): Unit =
    pqCoded(spark, newVectors, idCol, vecCol, m, kw).foreach { df =>
      graft.sources.Tables.requireLayoutMeta(spark, path, "m" -> m, "kw" -> kw)
      graft.sources.Tables.format.append(df, path)
      graft.sources.Tables.recordLayoutLineage(path, "append", newVectors, idCol)
    }

  /** ADC scoring + top-k over a (id, codes) frame — THE one definition of
    * the stored-codes scoring loop, shared by the flat PQ scan and the
    * IVF-PQ probe path (which only adds a partition filter in front).
    */
  private def adcTopK(
      spark: SparkSession,
      rows: DataFrame,
      idCol: String,
      qtab: Array[Array[Long]],
      k: Int
  ): DataFrame = {
    import spark.implicits._
    val t = spark.sparkContext.broadcast(qtab)
    rows
      .select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val tt = t.value
        it.map { case (id, codes) =>
          var score = 0L
          var s = 0
          while (s < codes.length) { score += tt(s)(codes(s) & 0xff); s += 1 }
          (id, score)
        }
      }
      .toDF(idCol, "pq_dot")
      .orderBy(col("pq_dot").desc, col(idCol).asc)
      .limit(k)
  }

  /** PQ top-k over STORED codes: scan reads m bytes per vector, score =
    * Σ_s qtab[s][codes[s]] (approximate dot — recall-vs-brute spec-gated;
    * the assignment+ADC arithmetic itself is exact and oracle-gated by q62).
    */
  def pqTopKStored(
      spark: SparkSession,
      layoutPath: String,
      idCol: String,
      query: Array[Float],
      k: Int,
      m: Int = 8,
      kw: Int = 16
  ): DataFrame = {
    graft.sources.Tables.requireLayoutMeta(spark, layoutPath, "m" -> m, "kw" -> kw)
    val qtab = pqQueryTable(query, pqCodebooks(query.length, m, kw))
    adcTopK(spark, spark.read.parquet(layoutPath), idCol, qtab, k)
  }

  /** IVF-PQ layout — the production vector-index shape (the FAISS IVFPQ
    * family): each vector stored as its PQ CODES (8 B at the defaults),
    * physically partitioned by its IVF cell. A query then (a) prunes
    * partition directories to its nProbe cells and (b) scores the surviving
    * rows by ADC table lookup — IO bounded by nProbe/nCells of an
    * already-32×-smaller table. Both constants come from the closed-form
    * fnv1a families, so the combined machinery stays SQL-reproducible.
    */
  def ivfPqWriteLayout(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nCells: Int = 16,
      m: Int = 8,
      kw: Int = 16
  ): Unit =
    ivfPqAssigned(spark, embeddings, idCol, vecCol, nCells, m, kw).foreach { df =>
      graft.sources.Tables.format.writePartitioned(df, path, "cell")
      // the layout's parameters are PART of the layout (the band-layout
      // rule): a probe ranking cells against different centroids, or an ADC
      // table built from different codebooks, silently returns wrong top-k —
      // so persist them under the path and validate on every append/probe
      graft.sources.Tables.writeLayoutMeta(spark, path,
        "n_cells" -> nCells, "m" -> m, "kw" -> kw)
      graft.sources.Tables.recordLayoutLineage(path, "build", embeddings, idCol)
    }

  private def requireIvfPqParams(
      spark: SparkSession, path: String, nCells: Int, m: Int, kw: Int): Unit =
    graft.sources.Tables.requireLayoutMeta(spark, path,
      "n_cells" -> nCells, "m" -> m, "kw" -> kw)

  private def ivfPqAssigned(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      m: Int,
      kw: Int
  ): Option[DataFrame] = {
    import spark.implicits._
    val first = embeddings.select(col(vecCol)).as[Array[Float]].take(1)
    if (first.isEmpty) return None
    val dim = first.head.length
    val cents = spark.sparkContext.broadcast(intCentroids(dim, nCells))
    val books = spark.sparkContext.broadcast(pqCodebooks(dim, m, kw))
    Some(embeddings
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cs = cents.value; val b = books.value
        it.map { case (id, v) =>
          val a = milliScaled(v)
          (id, pqAssign(a, b), rankCellsInt(a, cs)(0))
        }
      }
      .toDF(idCol, "codes", "cell"))
  }

  /** Incremental refresh of the IVF-PQ index: encode + cell-assign the new
    * batch (both closed-form, so appended rows are byte-identical to what a
    * full rebuild would produce) and append into the cell partitions.
    */
  def ivfPqAppendLayout(
      spark: SparkSession,
      newVectors: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nCells: Int = 16,
      m: Int = 8,
      kw: Int = 16
  ): Unit = {
    requireIvfPqParams(spark, path, nCells, m, kw)
    ivfPqAssigned(spark, newVectors, idCol, vecCol, nCells, m, kw).foreach { df =>
      graft.sources.Tables.format.appendPartitioned(df, path, "cell")
      graft.sources.Tables.recordLayoutLineage(path, "append", newVectors, idCol)
    }
  }

  /** IVF-PQ top-k: partition-pruned scan of the probed cells, ADC scoring
    * over the stored codes. Rows equal "PQ ADC restricted to the gate-IVF
    * probe set", which is what q73's oracle computes.
    */
  def ivfPqTopK(
      spark: SparkSession,
      layoutPath: String,
      idCol: String,
      query: Array[Float],
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      kw: Int = 16
  ): DataFrame = {
    requireIvfPqParams(spark, layoutPath, nCells, m, kw)
    val cents = intCentroids(query.length, nCells)
    val probe = rankCellsInt(milliScaled(query), cents).take(nProbe).toSeq
    val qtab = pqQueryTable(query, pqCodebooks(query.length, m, kw))
    adcTopK(
      spark,
      spark.read.parquet(layoutPath).filter(col("cell").isin(probe.map(Int.box): _*)),
      idCol, qtab, k)
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

  /** One query's results out of the multi-query aggregator. */
  final case class QueryHits(query_id: Long, hits: Seq[ScoredId])

  /** THE (query_id, id, score, rank) projection every multi-query path
    * shares: posexplode the per-query hit lists in rank order.
    */
  private def hitsToDf(
      hits: org.apache.spark.sql.Dataset[QueryHits],
      idCol: String,
      scoreName: String
  ): DataFrame =
    hits
      .select(col("query_id"), posexplode(col("hits")).as(Seq("rank0", "hit")))
      .select(
        col("query_id"),
        col("hit.id").as(idCol),
        col("hit.score").as(scoreName),
        (col("rank0") + 1).cast("bigint").as("rank"))

  /** Shared buffer machinery of EVERY multi-query top-k aggregator (float
    * dot, cell-filtered float dot, cell-filtered ADC): M bounded
    * score-ordered lists, the tie-break order, the bounded insert with the
    * cheap full-buffer reject, merge, finish, encoders. Subclasses supply
    * only `reduce` — how a corpus row scores against query m — so the
    * ordering logic has ONE definition and a tie-break change can never
    * desynchronize the float and compressed serving paths from their
    * single-query twins.
    */
  abstract class MultiQueryTopKBase[R](queryIds: Seq[Long], k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        R, Array[List[ScoredId]], Seq[QueryHits]] {
    private def better(a: ScoredId, b: ScoredId): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    private def insert(buf: List[ScoredId], v: ScoredId): List[ScoredId] = {
      val (pre, post) = buf.span(b => better(b, v))
      val merged = pre ::: v :: post
      if (merged.length > k) merged.take(k) else merged
    }
    /** Bounded offer: a full buffer whose tail beats the new score skips
      * the insert entirely (the common case once the heap warms up).
      */
    protected final def offer(buf: Array[List[ScoredId]], m: Int, id: Long, score: Long): Unit = {
      val b = buf(m)
      if (b.length < k || better(ScoredId(id, score), b.last)) buf(m) = insert(b, ScoredId(id, score))
    }
    def zero: Array[List[ScoredId]] = Array.fill(queryIds.length)(Nil)
    def merge(a: Array[List[ScoredId]], b: Array[List[ScoredId]]): Array[List[ScoredId]] =
      Array.tabulate(queryIds.length)(m => b(m).foldLeft(a(m))(insert))
    def finish(buf: Array[List[ScoredId]]): Seq[QueryHits] =
      queryIds.indices.map(m => QueryHits(queryIds(m), buf(m)))
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[List[ScoredId]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[List[ScoredId]]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[QueryHits]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[QueryHits]]()
  }

  /** Score-inside-combine batched ANN: ONE typed Aggregator whose buffer is
    * M bounded top-k lists, scoring every (corpus row, query) pair INSIDE
    * `reduce` — the M× row amplification of the flatMap-then-aggregate form
    * disappears (the M scores per corpus row live only as loop state, never
    * as materialized/encoded rows). Compute is the same M·N dots; what
    * changes is that the aggregation input is the corpus itself (N rows) and
    * the only shuffled bytes are the per-partition buffers (≤ M·k ScoredIds
    * each). The query batch is serialized with the aggregator — fine for
    * dashboard-scale M (it's one copy per TASK, not per row); a
    * million-query batch would switch to a broadcast handle, same shape.
    */
  class MultiQueryTopK(queries: Array[(Long, Array[Float])], k: Int)
      extends MultiQueryTopKBase[(Long, Array[Float])](queries.map(_._1).toSeq, k) {
    def reduce(buf: Array[List[ScoredId]], row: (Long, Array[Float])): Array[List[ScoredId]] = {
      val (id, v) = row
      var m = 0
      while (m < queries.length) {
        offer(buf, m, id, Sketches.scaledDot(v, queries(m)._2))
        m += 1
      }
      buf
    }
  }

  /** Batched multi-query exact top-k in one corpus pass with NO M×
    * intermediate rows (see MultiQueryTopK). Output: (query_id, idCol,
    * scaled_dot, rank) — identical rows to the flatMap + per-group window
    * form, proven equal in AnnSpec.
    */
  def multiQueryTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Array[(Long, Array[Float])],
      k: Int
  ): DataFrame = {
    import spark.implicits._
    val agg = new MultiQueryTopK(queries, k)
    hitsToDf(
      embeddings
        .select(col(idCol).cast("long"), col(vecCol))
        .as[(Long, Array[Float])]
        .select(agg.toColumn)
        .flatMap(identity(_)),
      idCol, "scaled_dot")
  }

  /** MultiQueryTopK over a CELL-AWARE corpus row: query m scores a row only
    * when the row's stored cell is in m's probe set — the batched form of
    * IVF probing, so M queries share ONE partition-pruned pass (the scan
    * reads the UNION of the probe sets; each query still scores exactly its
    * own probed cells, which keeps the result identical to M independent
    * ivfTopKGate calls and SQL-expressible).
    */
  class MultiQueryTopKCells(
      queries: Array[(Long, Array[Float], Set[Int])], k: Int)
      extends MultiQueryTopKBase[(Long, Array[Float], Int)](queries.map(_._1).toSeq, k) {
    def reduce(buf: Array[List[ScoredId]], row: (Long, Array[Float], Int)): Array[List[ScoredId]] = {
      val (id, v, cell) = row
      var m = 0
      while (m < queries.length) {
        if (queries(m)._3.contains(cell))
          offer(buf, m, id, Sketches.scaledDot(v, queries(m)._2))
        m += 1
      }
      buf
    }
  }

  /** Batched IVF ANN over the cell-partitioned layout: the scan's partition
    * filter is the UNION of the M queries' probe sets, scoring is
    * per-query-cell-filtered inside the aggregator combine — one
    * partition-pruned corpus pass serves the whole query batch, each query
    * getting exactly its ivfTopKGate result.
    */
  def multiQueryIvfPartitioned(
      spark: SparkSession,
      layoutPath: String,
      idCol: String,
      vecCol: String,
      queries: Array[(Long, Array[Float])],
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.requireLayoutMeta(spark, layoutPath, "n_cells" -> nCells)
    val cents = intCentroids(queries.head._2.length, nCells)
    val qs = queries.map { case (qid, qv) =>
      (qid, qv, rankCellsInt(milliScaled(qv), cents).take(nProbe).toSet)
    }
    val union = qs.flatMap(_._3).distinct.toSeq
    val agg = new MultiQueryTopKCells(qs, k)
    hitsToDf(
      spark.read.parquet(layoutPath)
        .filter(col("cell").isin(union.map(Int.box): _*))
        .select(col(idCol).cast("long"), col(vecCol), col("cell").cast("int"))
        .as[(Long, Array[Float], Int)]
        .select(agg.toColumn)
        .flatMap(identity(_)),
      idCol, "scaled_dot")
  }

  /** MultiQueryTopK over stored PQ CODES with per-query cell filtering —
    * the IVF-PQ twin of MultiQueryTopKCells: per query m carrying its own
    * ADC table and probe set, a row is scored only when its stored cell is
    * in m's probe set, and scoring is m table lookups over the 8-byte code
    * instead of a float dot. The batched form of the production index probe:
    * one codes-only, partition-pruned pass serves the whole batch, each
    * query getting exactly its ivfPqTopK result.
    */
  class MultiQueryTopKCodes(
      queries: Array[(Long, Array[Array[Long]], Set[Int])], k: Int)
      extends MultiQueryTopKBase[(Long, Array[Byte], Int)](queries.map(_._1).toSeq, k) {
    def reduce(buf: Array[List[ScoredId]], row: (Long, Array[Byte], Int)): Array[List[ScoredId]] = {
      val (id, codes, cell) = row
      var m = 0
      while (m < queries.length) {
        if (queries(m)._3.contains(cell)) {
          val tab = queries(m)._2
          var score = 0L
          var s = 0
          while (s < codes.length) { score += tab(s)(codes(s) & 0xff); s += 1 }
          offer(buf, m, id, score)
        }
        m += 1
      }
      buf
    }
  }

  /** Batched IVF-PQ ANN over the cell-partitioned stored-codes layout: the
    * scan's partition filter is the UNION of the M queries' probe sets and
    * reads ONLY the 8-byte codes column (~32× less IO than the float
    * layout); scoring is per-query ADC inside the aggregator combine. Each
    * query's rows equal an independent `ivfPqTopK` call (the serving spec
    * proves it). Output: (query_id, idCol, pq_dot, rank).
    */
  def multiQueryIvfPqPartitioned(
      spark: SparkSession,
      layoutPath: String,
      idCol: String,
      queries: Array[(Long, Array[Float])],
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      kw: Int = 16
  ): DataFrame = {
    import spark.implicits._
    requireIvfPqParams(spark, layoutPath, nCells, m, kw)
    val dim = queries.head._2.length
    val cents = intCentroids(dim, nCells)
    val books = pqCodebooks(dim, m, kw)
    val qs = queries.map { case (qid, qv) =>
      (qid, pqQueryTable(qv, books), rankCellsInt(milliScaled(qv), cents).take(nProbe).toSet)
    }
    val union = qs.flatMap(_._3).distinct.toSeq
    val agg = new MultiQueryTopKCodes(qs, k)
    hitsToDf(
      spark.read.parquet(layoutPath)
        .filter(col("cell").isin(union.map(Int.box): _*))
        .select(col(idCol).cast("long"), col("codes"), col("cell").cast("int"))
        .as[(Long, Array[Byte], Int)]
        .select(agg.toColumn)
        .flatMap(identity(_)),
      idCol, "pq_dot")
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
