package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.broadcast.Broadcast
import graft.functions.TextAnalysis

/** The corpus-curation kernel shared by the batch flagship (q67) and the
  * streaming form (StreamIngest.streamCurate): per-document metrics in ONE
  * narrow pass (language ID and token count as Column expressions fused
  * into the typed map's input projection; repetition and the
  * decontamination check inside the map against the broadcast eval-gram
  * set), plus the single definition of the keep thresholds. Stateless and
  * shuffle-free, so the identical code runs under batch and Structured
  * Streaming — StreamingSpec asserts the two executions agree row for row.
  */
object Curation {

  val Lang = "en"
  val MinTokens = 30L
  val MaxRepMicro = 150000L
  val GramN = 8

  /** Driver-side collect bound for eval-gram sets: an `isEval` predicate
    * that accidentally matches the whole corpus must fail FAST with a clear
    * error, not OOM the driver mid-collect. 2M grams × ~60 B ≈ 120 MB —
    * generous for any real eval suite, far under driver heap.
    */
  val MaxEvalGrams = 2000000

  /** The eval set's word-gram universe (bounded: the eval set is small by
    * definition) — collected once, broadcast by callers. Collection is
    * capped at [[MaxEvalGrams]]+1 rows IN THE PLAN (a `limit`, not a
    * post-collect check), so a corpus-sized eval predicate costs one extra
    * row before the guard trips, never a driver OOM.
    */
  def evalGramSet(docs: DataFrame, textCol: String,
      isEval: Column, n: Int = GramN): Set[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs.filter(isEval).select(col(textCol)).as[String]
      .flatMap(Dedup.wordGrams(_, n)).distinct()
      .limit(MaxEvalGrams + 1).collect()
    if (grams.length > MaxEvalGrams)
      throw new IllegalStateException(
        s"eval gram set exceeds $MaxEvalGrams grams - the isEval predicate " +
          "almost certainly matches far more than an eval suite; refusing to " +
          "broadcast it")
    grams.toSet
  }

  /** Per-doc metrics: (doc_id, text, lang_pred, n_tokens, rep_micro,
    * contaminated) — one narrow pass, batch or streaming.
    */
  def metrics(docs: DataFrame, idCol: String, textCol: String,
      evalGrams: Broadcast[Set[String]], n: Int = GramN): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col(idCol).cast("long"),
        col(textCol),
        TextAnalysis.langId(col(textCol)).as("lang_pred"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .as[(Long, String, String, Long)]
      .mapPartitions { it =>
        val g = evalGrams.value
        it.map { case (id, text, lang, ntok) =>
          val (mx, tot) = TextAnalysis.repetitionStats(text, 2)
          val rep = if (tot == 0) 0L else mx * 1000000L / tot
          (id, text, lang, ntok, rep, Dedup.wordGrams(text, n).exists(g.contains))
        }
      }
      .toDF("doc_id", "text", "lang_pred", "n_tokens", "rep_micro", "contaminated")
  }

  /** The curation keep-predicate — ONE definition of the thresholds. */
  def keepFilter: Column =
    col("lang_pred") === Lang && col("n_tokens") >= MinTokens &&
      col("rep_micro") < MaxRepMicro && !col("contaminated")

  /** Deterministic per-mille hash bucket of an id — the sampling primitive.
    * md5-based (not xxhash64) so the bucket is ENGINE-INDEPENDENT: the same
    * doc lands in the same bucket in Spark, DuckDB, or any engine with md5,
    * which is what makes a sample reproducible across re-runs, backfills,
    * and engines — the property `rand()` sampling can never give.
    */
  def hashBucket(id: Column, buckets: Int = 1000): Column =
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long") % buckets

  /** Deterministic stratified sampling: keep a row iff its hash bucket
    * falls under the row's per-stratum rate (per-mille). A pure narrow
    * filter — no shuffle, no state — and idempotent: re-running selects the
    * IDENTICAL sample, so downstream consumers can join across runs.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, ratePermille: Column): DataFrame =
    docs.filter(hashBucket(col(idCol)) < ratePermille)

  /** Mixture upsampling: replicate each row `weight` times with an `epoch`
    * index 0..weight-1 — the per-source mixing step of a training-data
    * recipe. Weight 0 — and NULL, the shape a recipe-join miss produces —
    * DROPS the row (both are "this source contributes nothing", made
    * explicit by the coalesce); the ≥1 guard is required because
    * `sequence(0, -1)` auto-steps BACKWARDS to [0, -1] instead of being
    * empty. Narrow explode; at 100 TB the epoch column is synthesized at
    * read time (a sequence join against the stored weight) rather than
    * materialized, but the row contract is this one.
    */
  def upsample(docs: DataFrame, weight: Column): DataFrame = {
    val w = coalesce(weight.cast("long"), lit(0L))
    docs.withColumn("epoch",
      explode(when(w >= 1L, sequence(lit(0L), w - 1))
        .otherwise(array().cast("array<bigint>"))))
  }
}
