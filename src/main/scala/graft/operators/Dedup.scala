package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Sketches

/** Deduplication operators for the training-data pipeline, from exact to
  * near-dup. Each has a distinct scale profile:
  *
  *  - exact:     one hash-aggregate shuffle on a 16-byte digest — the digest
  *               (not the document body) is the shuffle key, so 100 TB of
  *               text shuffles only ~rows × ~50 B.
  *  - minhashLSH: docs → signatures (narrow) → explode band keys → shuffle
  *               on band key → pairs within buckets. Candidate generation is
  *               linear in docs, never all-pairs.
  *  - simhash:   64-bit sketch per doc, near-dup = small hamming distance
  *               within band buckets.
  *  - ngramJaccard: exact verification joined onto LSH candidates only.
  *  - embedding near-dup lives in Ann.scala (same bucket-join shape).
  */
object Dedup {

  // compiled once — String.split(regex) recompiles the pattern per call,
  // and these splitters run per document (paragraphs, decontamination grams)
  private val WsPat = java.util.regex.Pattern.compile("\\s+")

  /** Cap a frame's partition count at what its own size estimate justifies
    * (guide §2.2 "fewer, larger map tasks" / §6 input split sizing): the
    * banding/pair stages of candidate generation are cheap per row, and a
    * sketch/signature table scanned at `files.minPartitionNum`-inflated
    * parallelism turns every downstream exchange into M×R shuffle-file
    * creations whose per-task fixed cost dwarfs the data (measured: the
    * band self-join + pair dedup at 32 map tasks × 128 shuffle partitions
    * cost ~26 task-seconds on a 2.5 MB signature table; 4 map tasks, 1.7).
    * Scale-adaptive, not core-count-tuned: partitions = ceil(estimated
    * bytes / targetBytes), and `coalesce` never increases a partition
    * count, so at corpus scale (estimate ≫ partitions × target) this is a
    * no-op. Frames with no usable size estimate are left untouched.
    */
  private def sizeJustifiedCoalesce(df: DataFrame, targetBytes: Long = 64L << 20): DataFrame = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= 0 || !est.isValidLong) df
    else df.coalesce(math.max(1L, (est.toLong + targetBytes - 1) / targetBytes)
      .min(Int.MaxValue.toLong).toInt)
  }

  /** The canonical normalized-content digest (whitespace-collapsed,
    * lowercased, md5) — THE content identity every exact-dedup consumer
    * shares (exact, q25, the q67 survivor pick). Delegates to the single
    * definition in TextAnalysis so the dedup key and the q32 fingerprint
    * column can never diverge.
    */
  def contentFingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.TextAnalysis.fingerprint(text)

  /** Exact dedup: survivor = min(id) per normalized-content digest. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    docs
      .withColumn("fp", contentFingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))
  }

  /** Windowed-distinct survivor pick (north_rule A4): keeps exactly one row
    * per key with a deterministic survivor, preserving all columns.
    */
  def windowedDistinct(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** MinHash signatures: (id, sig array). Narrow map, no shuffle. */
  def minHashSignatures(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      shingleN: Int = 5
  ): DataFrame = {
    import spark.implicits._
    val family = spark.sparkContext.broadcast(Sketches.hashFamily(numHashes))
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // fast path: identical signatures to minHash(shingles(text, n), _)
        // (MinHashFastSpec), without shingle-string/Set materialization
        (id, Sketches.minHashFromHashes(
          Sketches.shingleHashValues(text, shingleN), family.value))
      })
      .toDF("id", "sig")
  }

  /** LSH candidate pairs: explode band keys, self-join inside buckets
    * (id1 < id2), dedup pairs, then estimate Jaccard from signatures.
    * The band-key shuffle is the only wide op; bucket sizes are bounded by
    * similarity structure, with AQE skew-join as backstop for degenerate
    * buckets (e.g. empty docs).
    */
  def minHashCandidates(
      spark: SparkSession,
      sigs0: DataFrame,
      bands: Int = 16,
      minEstJaccard: Double = 0.5
  ): DataFrame = {
    val sigs = sizeJustifiedCoalesce(sigs0)
    // band the ids only — the bucket self-join and pair-dedup shuffles move
    // 16-byte pairs, not 8 KB signature arrays (64 hashes × 8 B × 16 bands);
    // signatures are joined back once per surviving pair
    val keys = banded(spark, sigs, bands)
    val l = keys.select(col("band"), col("bkey"), col("id").as("id1"))
    val r = keys.select(col("band"), col("bkey"), col("id").as("id2"))
    val pairs = l.join(r, Seq("band", "bkey"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .transform(pairParallelism(spark, _))
      .dropDuplicates("id1", "id2")
    estimatePairs(spark, sigs, pairs, minEstJaccard)
  }

  /** The pair-dedup exchange, width-controlled: dropDuplicates alone
    * shuffles at `spark.sql.shuffle.partitions` and AQE then coalesces the
    * READ side by byte size — correct for IO-bound stages, but the stage
    * consuming these pairs (the signature-estimate map) is CPU-bound per
    * row, so byte-based coalescing serializes it (measured: the whole
    * candidate tail collapsed to one task at sf0.1). An EXPLICIT
    * repartition on the dedup key keeps the same single exchange
    * (dropDuplicates reuses the hash distribution) while pinning the
    * post-shuffle width to the cluster's cores — the repo's convention for
    * CPU-bound stages (cores scale with the cluster, not with one host),
    * which AQE respects because user-specified repartitions are never
    * coalesced.
    */
  private[operators] def pairParallelism(spark: SparkSession, pairs: DataFrame): DataFrame =
    pairs.repartition(spark.sparkContext.defaultParallelism, col("id1"), col("id2"))

  /** The shared candidate tail: join signatures back per surviving pair and
    * keep pairs whose signature-estimated Jaccard clears the bar.
    */
  private def estimatePairs(
      spark: SparkSession,
      sigs: DataFrame,
      pairs: DataFrame,
      minEstJaccard: Double
  ): DataFrame = {
    val s1 = sigs.select(col("id").as("id1"), col("sig").as("sig1"))
    val s2 = sigs.select(col("id").as("id2"), col("sig").as("sig2"))
    // the agreement count as a NATIVE codegen expression over columnar
    // ArrayData (graft.plans.SigAgreeExpr): zero per-pair allocation.
    // Measured alternatives at sf0.1 candidate volume: the typed .map
    // deserialized two 64-long arrays per pair (GC-heavy serial tail); the
    // zip_with/aggregate HOF form is interpreted, ~2.5× slower than the
    // map. Division mirrors estJaccard exactly: eq.toDouble / s1.length.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sig_agree_fast",
      exprs => graft.plans.SigAgreeExpr(exprs.head, exprs(1)),
      "built-in")
    val eq = expr("sig_agree_fast(sig1, sig2)")
    pairs
      .join(s1, Seq("id1"))
      .join(s2, Seq("id2"))
      .select(col("id1"), col("id2"),
        (eq.cast("double") / size(col("sig1"))).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Diagnostics-only accessor for `banded` (graft.BenchExtra stage
    * isolation — not a query path).
    */
  private[graft] def bandedForDiagnostics(
      spark: SparkSession, sigs: DataFrame, bands: Int): DataFrame =
    banded(spark, sigs, bands)

  /** Banded (id, band, bkey) rows of a signature table — the LSH key
    * explode shared by the full and incremental candidate paths.
    */
  private def banded(spark: SparkSession, sigs: DataFrame, bands: Int): DataFrame = {
    import spark.implicits._
    sigs
      .as[(Long, Array[Long])]
      .flatMap { case (id, sig) =>
        Sketches.bandKeys(sig, bands).map { case (b, k) => (id, b, k) }
      }
      .toDF("id", "band", "bkey")
  }

  // -------------------------------------------- materialized signature table

  /** Materialize the (id, sig) MinHash signature table through the table-
    * format seam — the layout that makes 100 TB dedup re-runnable daily:
    * signatures are computed ONCE per document ever; a corpus append
    * computes signatures for the NEW batch only (appendSignatureLayout) and
    * bands them against the stored table (minHashCandidatesIncremental),
    * instead of re-sketching the whole corpus per run. Lineage rows record
    * which batches are in the table.
    */
  def writeSignatureLayout(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      numHashes: Int = 64,
      shingleN: Int = 5
  ): Unit = {
    graft.sources.Tables.format.write(
      minHashSignatures(spark, docs, idCol, textCol, numHashes, shingleN), path)
    graft.sources.Tables.recordLayoutLineage(path, "build", docs, idCol)
  }

  /** Incremental refresh: sketch ONLY the new batch, append. The hash
    * family is closed-form, so appended signatures are identical to what a
    * full rebuild would compute.
    */
  def appendSignatureLayout(
      spark: SparkSession,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      numHashes: Int = 64,
      shingleN: Int = 5
  ): Unit = {
    graft.sources.Tables.format.append(
      minHashSignatures(spark, newDocs, idCol, textCol, numHashes, shingleN), path)
    graft.sources.Tables.recordLayoutLineage(path, "append", newDocs, idCol)
  }

  /** Materialize the BANDED keys (id, band, bkey) partitioned by a hash
    * bucket of the band key — the layout that makes the stored side of
    * incremental dedup prunable: a small append touches a bounded set of
    * band-key buckets, and `minHashCandidatesStoredPruned` turns that set
    * into a PARTITION filter on this table, so the daily run reads only
    * the bucket directories the new batch can possibly collide in (the ANN
    * layouts' partition-filter pattern applied to LSH banding). With
    * `nBuckets` ≫ new-batch keys the stored-side IO is append-bounded; a
    * bulk re-run over everything just reads all buckets — same table.
    */
  def writeBandLayout(
      spark: SparkSession,
      sigs: DataFrame,
      path: String,
      bands: Int = 16,
      nBuckets: Int = 256
  ): Unit = {
    graft.sources.Tables.format.writePartitioned(
      bandBucketed(spark, sigs, bands, nBuckets), path, "bucket")
    // the layout's parameters are PART of the layout: a reader pruning with
    // different bands/nBuckets than the writer would silently drop pairs,
    // so they are persisted under the path (underscore dir — invisible to
    // the data scan) and validated on every append and pruned read
    graft.sources.Tables.writeLayoutMeta(spark, path, "bands" -> bands, "n_buckets" -> nBuckets)
    graft.sources.Tables.recordLayoutLineage(path, "build", sigs, "id")
  }

  private def requireBandParams(spark: SparkSession, path: String, bands: Int, nBuckets: Int): Unit =
    graft.sources.Tables.requireLayoutMeta(spark, path,
      "bands" -> bands, "n_buckets" -> nBuckets)

  /** Incremental refresh of the banded-key layout (append the new batch's
    * keys into their bucket partitions; parameters validated against the
    * layout's stored meta).
    */
  def appendBandLayout(
      spark: SparkSession,
      newSigs: DataFrame,
      path: String,
      bands: Int = 16,
      nBuckets: Int = 256
  ): Unit = {
    requireBandParams(spark, path, bands, nBuckets)
    graft.sources.Tables.format.appendPartitioned(
      bandBucketed(spark, newSigs, bands, nBuckets), path, "bucket")
    graft.sources.Tables.recordLayoutLineage(path, "append", newSigs, "id")
  }

  private def bandBucketed(
      spark: SparkSession,
      sigs: DataFrame,
      bands: Int,
      nBuckets: Int
  ): DataFrame =
    banded(spark, sigs, bands)
      .withColumn("bucket", graft.sources.Tables.format.bucket(col("bkey"), nBuckets))

  /** Incremental candidates with the stored side PRUNED: the new batch's
    * band keys determine a bucket set (≤ nBuckets, usually far fewer for a
    * small append), which becomes a partition filter on the stored banded
    * layout — only those bucket directories are read. Semantics equal
    * `minHashCandidatesIncremental` (the spec proves it); the difference
    * is stored-side IO proportional to the APPEND's collision surface
    * instead of the corpus.
    *
    * Ordering contract, ENFORCED: the stored layout must already contain
    * the new batch's keys (`appendBandLayout(newSigs)` before querying) —
    * otherwise new-vs-new collision pairs would silently vanish. Rather
    * than trusting the caller, the lineage audit below checks that the
    * layout's recorded batches cover `allSigs` exactly (one tiny aggregate
    * over the lineage log + one column-pruned id aggregate — zero IO
    * against the layout's data files) and throws on a gap.
    */
  def minHashCandidatesStoredPruned(
      spark: SparkSession,
      bandLayoutPath: String,
      allSigs: DataFrame,
      newSigs: DataFrame,
      bands: Int = 16,
      nBuckets: Int = 256,
      minEstJaccard: Double = 0.5
  ): DataFrame = {
    requireBandParams(spark, bandLayoutPath, bands, nBuckets)
    require(
      graft.sources.Tables.auditLayoutLineage(spark, bandLayoutPath, allSigs, "id"),
      s"band layout at $bandLayoutPath does not cover allSigs - " +
        "appendBandLayout the new batch BEFORE querying the pruned path, " +
        "or new-vs-new collision pairs would be silently dropped")
    val newKeys = bandBucketed(spark, sizeJustifiedCoalesce(newSigs), bands, nBuckets)
    // the bucket set is bounded by nBuckets (a few hundred Ints) — safe to
    // collect and inline as a partition-pruning predicate
    val buckets = newKeys.select(col("bucket")).distinct()
      .collect().map(_.getLong(0))
    val stored = spark.read.parquet(bandLayoutPath)
      .filter(col("bucket").isin(buckets.map(Long.box): _*))
    estimatePairs(spark, allSigs, newVsAllPairs(newKeys, stored), minEstJaccard)
  }

  /** Canonical new-vs-all pair set — join on band keys, drop self-pairs,
    * orient (min, max), dedup: the shared tail of both incremental
    * candidate paths, so pair canonicalization cannot drift between them.
    */
  private def newVsAllPairs(newKeys: DataFrame, allKeys: DataFrame): DataFrame =
    newKeys.select(col("band"), col("bkey"), col("id").as("idn"))
      .join(allKeys.select(col("band"), col("bkey"), col("id").as("ida")), Seq("band", "bkey"))
      .filter(col("idn") =!= col("ida"))
      .select(
        least(col("idn"), col("ida")).as("id1"),
        greatest(col("idn"), col("ida")).as("id2"))
      .transform(pairParallelism(newKeys.sparkSession, _))
      .dropDuplicates("id1", "id2")

  /** Incremental candidate generation after a corpus append: band the NEW
    * batch's signatures against the full stored table and emit only pairs
    * touching at least one new doc (old–old pairs were produced by earlier
    * runs — re-emitting them would redo the whole corpus's pair work every
    * day). Union(previous candidates, this) == candidates over the full
    * corpus — the invariant the spec proves.
    *
    * Cost honesty: what this makes append-linear is the EXPENSIVE per-doc
    * work — sketching (the dominant CPU; never recomputed for old docs)
    * and the pair/estimate volume (bounded by buckets the new batch
    * touches). The join's right side still scans and bands the full stored
    * table (corpus-linear IO of the compact sig rows, not of text); when
    * that matters too, `writeBandLayout` + `minHashCandidatesStoredPruned`
    * above materialize the banded keys bucket-partitioned so the new
    * batch's bucket set PRUNES the stored scan at the file level.
    */
  def minHashCandidatesIncremental(
      spark: SparkSession,
      allSigs0: DataFrame,
      newSigs0: DataFrame,
      bands: Int = 16,
      minEstJaccard: Double = 0.5
  ): DataFrame = {
    val allSigs = sizeJustifiedCoalesce(allSigs0)
    val newSigs = sizeJustifiedCoalesce(newSigs0)
    estimatePairs(spark, allSigs,
      newVsAllPairs(banded(spark, newSigs, bands), banded(spark, allSigs, bands)),
      minEstJaccard)
  }

  /** SimHash sketches (id, simhash). */
  def simHashes(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, t) => (id, Sketches.simHash(t)) }
      .toDF("id", "simhash")
  }

  /** SimHash near-dup pairs: band on `chunkBits`-bit chunks (any equal
    * chunk → candidate; Hamming ≤ maxHamming verified exactly). `chunks`
    * chunks guarantee recall for Hamming ≤ chunks−1 by pigeonhole. Defaults
    * cover the 64-bit fnv1a sketch; the oracle-gated md5 variant uses 4×12.
    */
  def simHashPairs(
      spark: SparkSession,
      hashes0: DataFrame,
      maxHamming: Int = 3,
      chunks: Int = 4,
      chunkBits: Int = 16
  ): DataFrame = {
    val hashes = sizeJustifiedCoalesce(hashes0)
    val banded = simBanded(spark, hashes, chunks, chunkBits)
    val l = banded.select(col("band"), col("chunk"), col("id").as("id1"), col("h").as("h1"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("id2"), col("h").as("h2"))
    val pairs = l.join(r, Seq("band", "chunk"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("h1"), col("h2"))
      .transform(pairParallelism(spark, _))
      .dropDuplicates("id1", "id2")
    hammingVerified(spark, pairs, maxHamming)
  }

  /** Chunk-banded (band, chunk, id, h) rows — shared by the full and
    * incremental SimHash paths.
    */
  private def simBanded(
      spark: SparkSession, hashes: DataFrame, chunks: Int, chunkBits: Int): DataFrame = {
    import spark.implicits._
    val mask = (1L << chunkBits) - 1
    hashes
      .as[(Long, Long)]
      .flatMap { case (id, h) =>
        (0 until chunks).map(b => (b, (h >>> (b * chunkBits)) & mask, id, h))
      }
      .toDF("band", "chunk", "id", "h")
  }

  /** Exact-Hamming verification tail over (id1, id2, h1, h2) pair rows.
    * bit_count(xor) as a codegen'd built-in — the former typed map
    * deserialized every candidate pair row into a Tuple4 (guide §4).
    */
  private def hammingVerified(spark: SparkSession, pairs: DataFrame, maxHamming: Int): DataFrame =
    pairs
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)

  /** Incremental SimHash near-dup after a corpus append — the
    * `minHashCandidatesIncremental` contract for the SimHash family:
    * chunk-band ONLY the new batch's sketches against the full table and
    * emit Hamming-verified pairs touching at least one new doc.
    * union(previous pairs, this) == simHashPairs over the full corpus.
    */
  def simHashPairsIncremental(
      spark: SparkSession,
      allHashes0: DataFrame,
      newHashes0: DataFrame,
      maxHamming: Int = 3,
      chunks: Int = 4,
      chunkBits: Int = 16
  ): DataFrame = {
    val allHashes = sizeJustifiedCoalesce(allHashes0)
    val newHashes = sizeJustifiedCoalesce(newHashes0)
    val bNew = simBanded(spark, newHashes, chunks, chunkBits)
      .select(col("band"), col("chunk"), col("id").as("idn"), col("h").as("hn"))
    val bAll = simBanded(spark, allHashes, chunks, chunkBits)
      .select(col("band"), col("chunk"), col("id").as("ida"), col("h").as("ha"))
    val pairs = bNew.join(bAll, Seq("band", "chunk"))
      .filter(col("idn") =!= col("ida"))
      .select(
        least(col("idn"), col("ida")).as("id1"),
        greatest(col("idn"), col("ida")).as("id2"),
        when(col("idn") < col("ida"), col("hn")).otherwise(col("ha")).as("h1"),
        when(col("idn") < col("ida"), col("ha")).otherwise(col("hn")).as("h2"))
      .transform(pairParallelism(spark, _))
      .dropDuplicates("id1", "id2")
    hammingVerified(spark, pairs, maxHamming)
  }

  /** Corpus-level boilerplate removal (the CCNet-style paragraph dedup a
    * web-text pipeline runs before training): split every doc into fixed
    * `paraWords`-word paragraphs, count each distinct paragraph's document
    * frequency across the corpus, drop paragraphs appearing in ≥ maxDocFreq
    * docs (copyright footers, nav bars, cookie banners), reassemble the
    * survivors in order. Two-pass corpus-statistic shape: one aggregation
    * shuffle for the df count — keyed on md5(para), so the wide op moves
    * 16-byte digests, never paragraph text — then a broadcast anti-join on
    * the digest (the boilerplate set is small by definition: it's the head
    * of the frequency distribution) and one groupBy to rebuild.
    *
    * Output: (idCol, kept_text) for EVERY input doc — a doc whose every
    * paragraph was boilerplate keeps an empty string, not a dropped row.
    */
  def dropBoilerplate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      paraWords: Int = 50,
      maxDocFreq: Long = 1000
  ): DataFrame = {
    val withFp = paragraphRows(docs, idCol, textCol, paraWords)
    val bp = withFp.groupBy("pfp").agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= maxDocFreq)
      .select(col("pfp"))
    val kept = withFp.join(broadcast(bp), Seq("pfp"), "left_anti").drop("pfp")
    val rebuilt = kept.groupBy("id").agg(
      array_join(
        transform(
          array_sort(collect_list(struct(col("pidx"), col("para")))),
          x => x.getField("para")),
        " ").as("kept_text"))
    docs.select(col(idCol).cast("long").as("id"))
      .join(rebuilt, Seq("id"), "left_outer")
      .select(col("id").as(idCol), coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** (id, pidx, para, pfp) paragraph rows — the shared splitter behind
    * boilerplate removal and the df-state maintenance (q93).
    */
  private def paragraphRows(
      docs: DataFrame, idCol: String, textCol: String, paraWords: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = WsPat.split(text.trim).filter(_.nonEmpty)
        toks.grouped(paraWords).zipWithIndex.map { case (ws, i) => (id, i, ws.mkString(" ")) }
      }
      .toDF("id", "pidx", "para")
      .withColumn("pfp", md5(col("para")))
  }

  /** The CORPUS-STATISTIC half of boilerplate removal, exposed for
    * incremental maintenance: per-paragraph-digest distinct-document
    * frequency. Distinct-doc counts over DOC-DISJOINT batches ADD, so the
    * stored (pfp, df) table maintains by sum-merge — the node-table algebra
    * applied to the pipeline's most expensive text statistic (q93 gates
    * it). At 100 TB this is the difference between re-counting every
    * paragraph of the corpus nightly and counting only the day's append.
    */
  def paragraphDf(
      docs: DataFrame, idCol: String, textCol: String, paraWords: Int = 50): DataFrame =
    paragraphRows(docs, idCol, textCol, paraWords)
      .groupBy("pfp").agg(countDistinct(col("id")).as("df"))

  // ------------------------------------------------ cluster resolution (CC)

  /** large-star: every node connects its strictly-larger neighbors to the
    * minimum of its neighborhood (including itself). The neighborhood min
    * rides a WINDOW over the node id rather than groupBy + join-back: the
    * same per-row semantics with ONE shuffle of the edge set instead of two
    * (agg + join re-shuffle) and one scan instead of two — per star the
    * round drops from 3 exchanges to 2. Rows are (Long, Long) pairs only.
    */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    val w = Window.partitionBy("u")
    sym
      .withColumn("m", least(min(col("v")).over(w), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
    // no trailing distinct: largeStar feeds only smallStar, whose window-min
    // is duplicate-insensitive and whose own trailing distinct restores set
    // semantics — dropping it removes one full exchange PER STAR ROUND at
    // the cost of ≤2|e| (instead of deduped) rows into smallStar's shuffle
  }

  /** small-star: orient edges toward the smaller endpoint, then every node
    * connects its ≤-neighbors (and itself) to the neighborhood minimum.
    * Window-min like largeStar, with BOTH output legs (v → m and u → m)
    * emitted from the one windowed pass by a narrow explode — a unionAll of
    * two references would evaluate the window twice. The u → m leg appears
    * once per row rather than once per node; the trailing distinct
    * collapses the duplicates, so set semantics are unchanged and no extra
    * exchange is spent deduplicating the leg early.
    */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val w = Window.partitionBy("u")
    oriented
      .withColumn("m", min(col("v")).over(w))
      .select(explode(array(
        struct(col("v").as("u"), col("m").as("v")),
        struct(col("u").as("u"), col("m").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Connected components over candidate pairs — the step every pair-
    * emitting near-dup operator (minhash/simhash/embedding) stops short of:
    * a 100 TB dedup keeps one doc per CLUSTER, not per pair. Alternating
    * small-star/large-star joins (Kiveris et al., "Connected Components in
    * MapReduce and Beyond" — no GraphX dependency), iterated to fixpoint
    * with a bounded iteration count (converges in O(log n) rounds; n here
    * is the largest component, so the bound is generous).
    *
    * Scale shape: every shuffle in every iteration moves two-Long rows
    * (node, candidate-parent) — never document payloads (PlanSpec-asserted).
    * `localCheckpoint` truncates the per-iteration lineage so plan size
    * stays constant across rounds.
    *
    * Convergence (the Kiveris changed-row counter, adapted to exactness):
    * the per-round check is ONE tiny aggregate over the just-checkpointed
    * edge set — an order-independent signature (count + two independent
    * xor-folds of xxhash64, overflow-free at any edge count) compared to
    * the previous round's. Equal sets always
    * produce equal signatures, so the exact (shuffle-heavy) `except` check
    * runs ONCE, when the signature first repeats, to confirm the fixpoint —
    * a signature collision between distinct sets merely costs one extra
    * except that says "keep going", never a wrong answer. Per-round jobs
    * drop from 3 (checkpoint + count + except) to 2 (checkpoint + tiny agg
    * over block-manager-resident two-Long rows), and the except's
    * double-shuffle leaves the loop entirely.
    *
    * Returns (id, component) for every node appearing in `pairs`, where
    * component = min id of the connected component (so the component id IS
    * the min-id survivor). Component centers map to themselves.
    */
  def components(spark: SparkSession, pairs: DataFrame, maxIters: Int = 20): DataFrame =
    componentsWithStatus(spark, pairs, maxIters)._1

  /** `components` with the convergence flag exposed: past `maxIters` the
    * current labels are RETURNED (flag false, warning logged) rather than
    * the job killed — on a pathological graph a 100 TB run degrades to
    * approximate labels a caller can quarantine, instead of discarding
    * maxIters rounds of cluster work at the finish line.
    */
  def componentsWithStatus(
      spark: SparkSession,
      pairs: DataFrame,
      maxIters: Int = 20
  ): (DataFrame, Boolean) = {
    val init = pairs
      .select(col(pairs.columns(0)).cast("long").as("u"), col(pairs.columns(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // order-independent set signature: count + two independent xor-folds
    // (the second over the swapped pair = a different 64-bit hash of the same
    // row). xor cannot overflow at ANY edge count — a sum term would wrap a
    // Long past ~2^32 edges and THROW under ANSI mode, exactly the corpora
    // this operator is pitched at
    def signature(df: DataFrame): (Long, Long, Long) = {
      val r = df.select(
        count(lit(1)),
        expr("bit_xor(xxhash64(u, v))"),
        expr("bit_xor(xxhash64(v, u))")).head()
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    // LAZY localCheckpoint + the signature aggregate as its materializing
    // action: one job per round computes the stars, caches the blocks,
    // truncates the lineage AND returns the convergence signature — there is
    // no separate checkpoint/count/except job left in the loop at all
    // (the initial signature also doubles as the emptiness check)
    //
    // Partition economy per round: the checkpointed edge set inherits the
    // session's shuffle partition count, so each of the next round's
    // exchanges would create (that many map tasks) × (shuffle partitions)
    // shuffle files regardless of edge volume. The signature aggregate
    // already knows the EXACT edge count, so cap the checkpoint's
    // partitioning at what the rows justify (two-Long rows; ~1M rows per
    // partition ⇒ ~16 MB tasks) — a narrow cached-block merge, a no-op
    // whenever the justified count meets the current one (large graphs).
    def rowJustified(df: DataFrame, rows: Long): DataFrame =
      df.coalesce(math.max(1L, rows >> 20).min(Int.MaxValue.toLong).toInt)
    var e = init.localCheckpoint(false)
    var sig = signature(e)
    if (sig._1 == 0) return (e.select(col("u").as("id"), col("v").as("component")), true)
    e = rowJustified(e, sig._1)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val next = smallStar(largeStar(e)).localCheckpoint(false)
      val nextSig = signature(next)
      val nextBalanced = rowJustified(next, nextSig._1)
      // signature repeat ⇒ run the exact confirmation (once, at fixpoint)
      if (nextSig == sig) converged = nextBalanced.except(e).isEmpty
      sig = nextSig
      e = nextBalanced
      it += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"components did not converge in $maxIters star rounds; returning current labels")
    // at fixpoint edges form stars (node → component min); add the centers —
    // the outer distinct subsumes deduping the center side, so the union
    // needs no inner distinct (one fewer exchange on the label read-out)
    val raw = e.select(col("u").as("id"), col("v").as("component"))
      .unionByName(e.select(col("v").as("id"), col("v").as("component")))
    // converged ⇒ the star forest already has exactly one row per node, so
    // distinct suffices; NOT converged ⇒ a node can still hold several
    // candidate parents, and emitting them all would duplicate every
    // downstream join — collapse to the best (minimum) label per node so
    // the degraded output keeps the one-row-per-id contract
    val labels =
      if (converged) raw.distinct()
      else raw.groupBy("id").agg(min(col("component")).as("component"))
    (labels, converged)
  }

  /** Incremental connected components — the label-update step of daily
    * dedup: yesterday's (id, component) labels ARE a connectivity-
    * preserving contraction of yesterday's graph (every node wired to its
    * component min), so running the star algorithm over
    * labels-as-edges ∪ today's new candidate pairs yields exactly the
    * components of the full cumulative graph — without ever rebuilding or
    * re-walking yesterday's edge set, whose size is corpus-scale while the
    * label table is one row per node. Composes with
    * `minHashCandidatesIncremental`/`minHashCandidatesStoredPruned` to
    * close the loop: append → new pairs → label update → survivors.
    */
  def componentsIncremental(
      spark: SparkSession,
      oldLabels: DataFrame,
      newPairs: DataFrame,
      maxIters: Int = 20,
      requireConverged: Boolean = true
  ): DataFrame = {
    val asEdges = oldLabels.select(
      col(oldLabels.columns(0)).cast("long").as("u"),
      col(oldLabels.columns(1)).cast("long").as("v"))
    val fresh = newPairs.select(
      col(newPairs.columns(0)).cast("long").as("u"),
      col(newPairs.columns(1)).cast("long").as("v"))
    // same non-convergence stance as clusters(): the daily loop must not be
    // QUIETER about approximate labels than the one-shot path it replaces
    val (labels, converged) =
      componentsWithStatus(spark, asEdges.unionByName(fresh), maxIters)
    if (requireConverged && !converged)
      throw new IllegalStateException(
        s"incremental components did not converge in $maxIters rounds; " +
          "pass requireConverged=false to accept approximate labels")
    labels
  }

  /** Cluster-resolved dedup: every doc gets its cluster id (= min doc id of
    * its near-dup component, itself when unpaired) and a survivor flag.
    * This is the terminal operator of the dedup pipeline: candidates →
    * verify → components → per-cluster survivor pick.
    *
    * Non-convergence is an EXPLICIT caller choice here, not a log line: the
    * default (`requireConverged = true`) throws if the component loop hits
    * `maxIters` without a fixpoint, because a silently-approximate label
    * yields silently-wrong survivor flags. A caller that prefers degraded
    * labels over a dead 100 TB job passes `requireConverged = false` —
    * opting in to approximate clusters knowingly (or calls
    * `componentsWithStatus` itself to quarantine them).
    */
  def clusters(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      maxIters: Int = 20,
      requireConverged: Boolean = true
  ): DataFrame = {
    val (comp, converged) = componentsWithStatus(docs.sparkSession, pairs, maxIters)
    if (requireConverged && !converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIters rounds; " +
          "pass requireConverged=false to accept approximate cluster labels")
    clustersFromLabels(docs, idCol, comp)
  }

  /** The label→survivor tail of `clusters`, reusable with labels from ANY
    * source — in particular `componentsIncremental`'s updated labels, so
    * the daily loop never recomputes components to re-derive survivors.
    */
  def clustersFromLabels(docs: DataFrame, idCol: String, labels: DataFrame): DataFrame =
    docs
      .select(col(idCol).cast("long").as("id"))
      .join(labels, Seq("id"), "left_outer")
      .select(
        col("id").as(idCol),
        coalesce(col("component"), col("id")).as("cluster_id")
      )
      .withColumn("is_survivor", col(idCol) === col("cluster_id"))

  /** Benchmark decontamination — the step a training-data pipeline runs
    * before anything ships to a trainer: flag every TRAIN document sharing
    * at least one `n`-word gram with any EVAL document (the standard
    * 8-gram-overlap rule of GPT-3/PaLM-style decontamination). Scale shape:
    * the eval set is SMALL by definition, so its gram set is collected once
    * and broadcast; the corpus pass is then a narrow map — zero shuffles,
    * the binary/text column is read exactly once. (At extreme eval sizes
    * the broadcast set becomes a Bloom filter + exact re-check join; the
    * call-site shape is unchanged.)
    *
    * `isEval` partitions docs by id; output = one row per TRAIN doc:
    * (idCol, contaminated).
    */
  def decontaminate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isEval: org.apache.spark.sql.Column,
      n: Int = 8
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"), isEval.as("ev"))
    val evalGrams = base.filter(col("ev")).select(col("text")).as[String]
      .flatMap(wordGrams(_, n)).distinct().collect().toSet
    val gramsB = spark.sparkContext.broadcast(evalGrams)
    base.filter(!col("ev"))
      .select(col("id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val g = gramsB.value
        it.map { case (id, text) => (id, wordGrams(text, n).exists(g.contains)) }
      }
      .toDF(idCol, "contaminated")
  }

  /** The extreme-eval-size decontamination variant the broadcast-set form
    * documents: when the eval gram universe is too large to collect+
    * broadcast as exact strings, ship a BLOOM FILTER of it instead (fixed
    * size set by `expectedGrams`/`fpp`, independent of actual gram bytes)
    * and recover exactness with one re-check join on the survivors:
    *
    *  1. build: one distributed `bloomFilter` aggregate over the eval grams
    *     (driver holds ~1.2 MB per 1M grams at 1% fpp — bounded by the
    *     PARAMETERS, never by eval text size);
    *  2. screen (narrow, zero-shuffle): a corpus pass keeps only grams the
    *     filter might contain — no false negatives by construction, so
    *     every truly contaminated doc survives screening;
    *  3. exact re-check: the screened (id, gram) rows — a tiny slice of the
    *     corpus gram volume — semi-join the true eval gram set, turning
    *     Bloom false positives back into clean docs.
    *
    * Output contract is identical to `decontaminate` (one row per TRAIN
    * doc: idCol, contaminated), and DedupSpec proves the two paths equal on
    * a corpus where false positives demonstrably occur.
    */
  def decontaminateBloom(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isEval: org.apache.spark.sql.Column,
      n: Int = 8,
      expectedGrams: Long = 1000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"), isEval.as("ev"))
    val evalGrams = base.filter(col("ev")).select(col("text")).as[String]
      .flatMap(wordGrams(_, n)).toDF("gram").distinct()
    val bloomB = spark.sparkContext.broadcast(
      evalGrams.stat.bloomFilter("gram", expectedGrams, fpp))
    val train = base.filter(!col("ev")).select(col("id"), col("text"))
    // screen + project in one narrow pass: emit only the (deduped) grams the
    // filter might contain — the join input is the FP-rate-sized slice of
    // the corpus, not its full gram volume
    val candGrams = train.as[(Long, String)]
      .mapPartitions { it =>
        val bf = bloomB.value
        it.flatMap { case (id, text) =>
          wordGrams(text, n).filter(bf.mightContainString)
            .toSet[String].iterator.map(g => (id, g))
        }
      }
      .toDF("id", "gram")
    val contaminated = candGrams.join(evalGrams, Seq("gram"), "left_semi")
      .select(col("id")).distinct()
      .withColumn("hit", lit(true))
    train.select(col("id"))
      .join(contaminated, Seq("id"), "left_outer")
      .select(col("id").as(idCol), coalesce(col("hit"), lit(false)).as("contaminated"))
  }

  /** Word n-grams of whitespace-tokenized text; empty below n words. The
    * shared tokenization of decontaminate and its streaming form.
    */
  def wordGrams(text: String, n: Int): Iterator[String] = {
    val toks = WsPat.split(text).filter(_.nonEmpty)
    if (toks.length < n) Iterator.empty else toks.sliding(n).map(_.mkString(" "))
  }

  /** Exact n-gram Jaccard verification over candidate pairs: joins the raw
    * text back ONLY for candidates (broadcast the candidate ids when small).
    */
  def verifyJaccard(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      candidates: DataFrame,
      shingleN: Int = 5,
      minJaccard: Double = 0.8
  ): DataFrame = {
    import spark.implicits._
    val txt = docs.select(col(idCol).cast("long").as("jid"), col(textCol).as("jtext"))
    candidates
      .join(txt, col("id1") === col("jid"))
      .withColumnRenamed("jtext", "text1").drop("jid")
      .join(txt, col("id2") === col("jid"))
      .withColumnRenamed("jtext", "text2").drop("jid")
      .select(col("id1"), col("id2"), col("text1"), col("text2"))
      .as[(Long, Long, String, String)]
      .map { case (a, b, t1, t2) =>
        (a, b, Sketches.jaccard(Sketches.shingles(t1, shingleN), Sketches.shingles(t2, shingleN)))
      }
      .toDF("id1", "id2", "jaccard")
      .filter(col("jaccard") >= minJaccard)
  }
}
