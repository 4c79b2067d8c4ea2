package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.DiffHtml

/** E2 — the distributed form of the diff-table → RDF walk: one narrow
  * flatMap per change row (no shuffle; each diff document is independent),
  * emitting one row per generated DELETE/INSERT block. The per-document walk
  * is graft.text.DiffHtml.convertToRdf (see its Scaladoc for the 1:1 port
  * map against /root/reference/src/wikidata_update/get_updates.py:191-572).
  *
  * At 100 TB: diff HTML is the widest column; it is consumed and dropped
  * inside the flatMap, so only the (entity, op, rdf, ts) blocks reach any
  * downstream wide operator. Skew-free: cost is linear in the document.
  */
object DiffTableRdf {

  /** `changes` columns: entity, ts (string), revid, old_revid, diff_html. */
  def convert(spark: SparkSession, changes: DataFrame): DataFrame = {
    import spark.implicits._
    changes
      .select(col("entity"), col("ts"), col("revid").cast("long"),
        col("old_revid").cast("long"), col("diff_html"))
      .as[(String, String, Long, Long, String)]
      .flatMap { case (entity, ts, revid, oldRevid, html) =>
        DiffHtml.convertToRdf(html, entity, ts, revid, oldRevid)
          .map(r => (r.subject, r.op, r.rdf, r.timestamp))
      }
      .toDF("entity", "op", "rdf", "ts")
  }

  /** Time-resolved form: `changes` additionally carries `entity_json` (the
    * revisioned wbgetentities document joined in as a column — the batched
    * stand-in for the reference's per-change HTTP fetch, get_updates.py:
    * 668-675), so time-rendered objects render as exact
    * `"…"^^xsd:dateTime` literals; `specific=true` also emits the minted
    * v:-node statements and their TimeValue blocks (`--specific` mode).
    * Still a narrow per-row flatMap — the JSON rides the same row, no
    * extra shuffle.
    */
  def convertResolved(spark: SparkSession, changes: DataFrame, specific: Boolean): DataFrame = {
    import spark.implicits._
    changes
      .select(col("entity"), col("ts"), col("revid").cast("long"),
        col("old_revid").cast("long"), col("diff_html"), col("entity_json"))
      .as[(String, String, Long, Long, String, String)]
      .flatMap { case (entity, ts, revid, oldRevid, html, json) =>
        DiffHtml.convertToRdf(html, entity, ts, revid, oldRevid, Option(json), specific)
          .map(r => (r.subject, r.op, r.rdf, r.timestamp))
      }
      .toDF("entity", "op", "rdf", "ts")
  }
}

/** J4 — time-value node resolution: the reference's get_time_node
  * (/root/reference/src/wikidata_update/get_updates.py:734-803) queries a
  * SPARQL endpoint for `ref:<hash> ?p ?v FILTER STRSTARTS(STR(?p),
  * STR(prv:))` and takes `value.split("/")[-1]` as the `v:` node id, with a
  * TTL-parse fallback. Re-expressed Spark-first: the endpoint becomes a
  * reference-node triple dim table, the STRSTARTS filter a pushed-down
  * `startsWith` on the predicate column, the lookup a broadcast join, and
  * the nondeterministic bindings[0] a deterministic min over (predicate,
  * value).
  *
  * At 100 TB the dim is the small side (one row per reference node) →
  * broadcast; the changes side never shuffles.
  */
object TimeNodes {

  val PrvUri = "http://www.wikidata.org/prop/reference/value/"

  /** `changes` must carry `ref_id`; `refTriples` columns: ref_id, predicate,
    * value. Adds `time_node` = "v:" + last path segment of the prv: value
    * (null where the reference node has no prv: triple — the reference
    * returns None there).
    */
  def resolve(changes: DataFrame, refTriples: DataFrame): DataFrame = {
    val prv = refTriples
      .filter(col("predicate").startsWith(PrvUri))
      .groupBy(col("ref_id"))
      .agg(min(struct(col("predicate"), col("value"))).as("m"))
      .select(
        col("ref_id"),
        concat(lit("v:"), element_at(split(col("m.value"), "/"), -1)).as("time_node")
      )
    changes.join(broadcast(prv), Seq("ref_id"), "left_outer")
  }
}
