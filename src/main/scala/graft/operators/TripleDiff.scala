package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's computational core, distributed: triple-set difference
  * (/root/reference/src/wikidata_update/ttl_compare.py:180-188 —
  * `added = g_new - g_old`, `removed = g_old - g_new`) as shuffle anti-joins
  * keyed on the full triple. This is the pipeline's only required shuffle
  * besides final dedup (SURVEY.md §2.3 J1).
  *
  * Both directions in one pass: a full-outer join on the triple key with
  * null-side filters shares ONE shuffle for added+removed instead of two
  * anti-joins shuffling the same data twice — at 100 TB that halves the
  * dominant shuffle. Per-entity grouping keys ride along so one call diffs
  * every (entity, revision-pair) in the batch at once.
  */
object TripleDiff {

  /** Triple identity columns (null-safe on the optional tag columns). */
  val keyCols: Seq[String] = Seq("entity", "subj", "pred", "obj", "obj_lang", "obj_type")

  /** added = new ∖ old (left_anti). */
  def added(newDf: DataFrame, oldDf: DataFrame, keys: Seq[String] = keyCols): DataFrame =
    antiOn(newDf, oldDf, keys)

  /** removed = old ∖ new (left_anti). */
  def removed(newDf: DataFrame, oldDf: DataFrame, keys: Seq[String] = keyCols): DataFrame =
    antiOn(oldDf, newDf, keys)

  private def antiOn(l: DataFrame, r: DataFrame, keys: Seq[String]): DataFrame = {
    val cond = keys.map(k => l(k) <=> r(k)).reduce(_ && _)
    l.join(r, cond, "left_anti")
  }

  /** diffOps specialized to the common case where BOTH revisions derive
    * from ONE frame: each row carries the key columns plus two membership
    * flags (row belongs to the old / the new revision; each row must be in
    * at least one — enforced by the pre-filter). ONE scan and ONE
    * map-side-combining aggregation replace diffOps' two distincts + a
    * full-outer join (guide §2.3 aggregate-before-shuffle, §8 use what the
    * optimizer cannot see: the two sides share a subtree, which diffOps
    * would evaluate twice). Output rows and schema are identical to
    * `diffOps(df.filter(inOld), df.filter(inNew), keys)`.
    */
  def diffOpsFromFlags(
      df: DataFrame, inOld: org.apache.spark.sql.Column,
      inNew: org.apache.spark.sql.Column, keys: Seq[String] = keyCols): DataFrame =
    df.filter(inOld || inNew)
      .select(keys.map(col) :+ inOld.as("__in_old") :+ inNew.as("__in_new"): _*)
      .groupBy(keys.map(col): _*)
      .agg(max(col("__in_old")).as("__in_old"), max(col("__in_new")).as("__in_new"))
      .select(keys.map(col) :+
        when(!col("__in_old"), lit("INSERT"))
          .when(!col("__in_new"), lit("DELETE"))
          .otherwise(lit(null).cast("string")).as("op"): _*)
      .filter(col("op").isNotNull)

  /** Single-shuffle both-directions diff: returns the union tagged with
    * op ∈ {INSERT, DELETE}. Input rows are deduplicated per side first
    * (set semantics, like rdflib Graph).
    */
  def diffOps(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String] = keyCols): DataFrame = {
    // rename the new side's columns so self-derived inputs never collide
    val o = oldDf.select(keys.map(col): _*).distinct()
      .withColumn("in_old", lit(1))
    val n = newDf.select(keys.map(k => col(k).as(s"${k}__new")): _*).distinct()
      .withColumn("in_new", lit(1))
    val cond = keys.map(k => col(k) <=> col(s"${k}__new")).reduce(_ && _)
    o.join(n, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(k), col(s"${k}__new")).as(k)) :+
          when(col("in_old").isNull, lit("INSERT"))
            .when(col("in_new").isNull, lit("DELETE"))
            .otherwise(lit(null).cast("string")).as("op"): _*
      )
      .filter(col("op").isNotNull)
  }
}
