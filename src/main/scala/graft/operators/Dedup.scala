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

  /** Exact dedup: survivor = min(id) per normalized-content digest. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    docs
      .withColumn("fp", md5(lower(regexp_replace(trim(col(textCol)), "\\s+", " "))))
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
        (id, Sketches.minHash(Sketches.shingles(text, shingleN), family.value))
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
      sigs: DataFrame,
      bands: Int = 16,
      minEstJaccard: Double = 0.5
  ): DataFrame = {
    import spark.implicits._
    // band the ids only — the bucket self-join and pair-dedup shuffles move
    // 16-byte pairs, not 8 KB signature arrays (64 hashes × 8 B × 16 bands);
    // signatures are joined back once per surviving pair
    val banded = sigs
      .as[(Long, Array[Long])]
      .flatMap { case (id, sig) =>
        Sketches.bandKeys(sig, bands).map { case (b, k) => (id, b, k) }
      }
      .toDF("id", "band", "bkey")
    val l = banded.select(col("band"), col("bkey"), col("id").as("id1"))
    val r = banded.select(col("band"), col("bkey"), col("id").as("id2"))
    val pairs = l.join(r, Seq("band", "bkey"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .dropDuplicates("id1", "id2")
    val s1 = sigs.select(col("id").as("id1"), col("sig").as("sig1"))
    val s2 = sigs.select(col("id").as("id2"), col("sig").as("sig2"))
    pairs
      .join(s1, Seq("id1"))
      .join(s2, Seq("id2"))
      .select(col("id1"), col("id2"), col("sig1"), col("sig2"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .map { case (a, b, sg1, sg2) => (a, b, Sketches.estJaccard(sg1, sg2)) }
      .toDF("id1", "id2", "est_jaccard")
      .filter(col("est_jaccard") >= minEstJaccard)
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

  /** SimHash near-dup pairs: band on 16-bit chunks (any equal chunk →
    * candidate; Hamming ≤ maxHamming verified exactly). 4 chunks guarantee
    * recall for Hamming ≤ 3 by pigeonhole.
    */
  def simHashPairs(spark: SparkSession, hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val banded = hashes
      .as[(Long, Long)]
      .flatMap { case (id, h) =>
        (0 until 4).map(b => (b, (h >>> (b * 16)) & 0xffffL, id, h))
      }
      .toDF("band", "chunk", "id", "h")
    val l = banded.select(col("band"), col("chunk"), col("id").as("id1"), col("h").as("h1"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("id2"), col("h").as("h2"))
    l.join(r, Seq("band", "chunk"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("h1"), col("h2"))
      .dropDuplicates("id1", "id2")
      .as[(Long, Long, Long, Long)]
      .map { case (a, b, h1, h2) => (a, b, Sketches.hamming(h1, h2)) }
      .toDF("id1", "id2", "hamming")
      .filter(col("hamming") <= maxHamming)
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
