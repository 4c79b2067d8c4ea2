package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{Alias, Mention}

/** Entity linking: mention → ranked QID candidates via a broadcast hash join
  * against the alias dim, top-k per mention by (prior, qid) — replacing the
  * reference's per-surface href/title resolution
  * (/root/reference/src/wikidata_update/get_updates.py:883-916) and its
  * remote SPARQL lookups (806-881) with one local join.
  *
  * Scale notes: the alias table is ≪ fact side ⇒ `broadcast()` hint (no
  * shuffle on the fact side). The top-k window partitions by mention key —
  * that IS a shuffle, but on the naturally high-cardinality (url, begin)
  * key, so no skew: hot *surfaces* (e.g. "scan") do not concentrate because
  * the partition key includes url. For dims too big to broadcast, use
  * `saltedJoin` below.
  */
object Linking {

  def candidates(
      spark: SparkSession,
      mentions: Dataset[Mention],
      aliases: Seq[Alias]
  ): DataFrame = {
    import spark.implicits._
    val dim = aliases.toDF()
    mentions
      .join(broadcast(dim), Seq("surface"))
      .select(col("url"), col("surface"), col("begin"), col("qid"), col("prior").as("score"))
  }

  /** Top-k candidates per mention occurrence; deterministic tiebreak on qid. */
  def topK(cands: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy(col("url"), col("surface"), col("begin"))
      .orderBy(col("score").desc, col("qid").asc)
    cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("rank")
  }

  /** Skew-resistant variant for non-broadcastable dims (SURVEY.md §2.3 J-
    * graft): replicate each dim row SALT times with a salt column, salt the
    * fact side by a url-hash, join on (surface, salt). Head surfaces spread
    * over SALT reducers; AQE skew-join remains the backstop.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, salt: Int): DataFrame = {
    val saltedDim = dim.withColumn("salt", explode(array((0 until salt).map(lit): _*)))
    val saltedFacts = facts.withColumn("salt", pmod(hash(col("url")), lit(salt)))
    saltedFacts.join(saltedDim, Seq("surface", "salt")).drop("salt")
  }

  /** TF-IDF context scoring: document frequency per surface via groupBy-count
    * (plain Spark beats a custom Aggregator here — SURVEY.md §2.9), then
    * score = prior * log(N / df). Demonstrates the two-pass corpus statistic
    * shape: the df aggregation is the only extra shuffle and it aggregates
    * partially map-side.
    */
  def tfidfScored(cands: DataFrame, totalDocs: Long): DataFrame = {
    val df = cands.groupBy("surface").agg(countDistinct("url").as("doc_freq"))
    cands
      .join(broadcast(df), Seq("surface"))
      .withColumn("score", col("score") * log(lit(totalDocs.toDouble + 1) / (col("doc_freq") + 1)))
      .drop("doc_freq")
  }
}
