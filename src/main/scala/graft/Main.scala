package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.{SparqlFormat, Validate}
import graft.operators.TripleDiff
import graft.pipeline.KgPipeline

/** CLI entry point mirroring the reference's `wikidata-update` console
  * script (setup.py:17-20 → sparql_updates.main, sparql_updates.py:336-462):
  * validate args → load the bounded change window → pair each change with
  * its old/new snapshots (old_revid==0 → empty old) → distributed triple-set
  * diff → per-entity DELETE/INSERT command blocks → changes file in the
  * reference's exact output grammar.
  *
  * The per-entity HTTP loop is replaced by set-based Spark ops end to end:
  * one join pairs ALL changes with snapshots, one full-outer diff covers
  * every (entity, revision-pair) at once.
  *
  * Usage (all flags optional):
  *   runMain graft.Main [--data DIR] [--type edit|new|edit|new] [--number N]
  *                      [--start "YYYY-MM-DD HH:MM:SS" --end "..."]
  *                      [--file out.ttl] [--latest]
  *
  * Change/snapshot tables are synthesized deterministically from the events
  * table (no network — FIXTURES.md §4 shape).
  */
object Main {

  def main(args: Array[String]): Unit = {
    val a = parse(args)
    val now = java.time.LocalDateTime.now()
    Validate.verifyArgs(a.runArgs, now) match {
      case Some(err) => System.err.println(err); sys.exit(2)
      case None      => ()
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val out = run(spark, a)
      a.runArgs.file match {
        case Some(f) =>
          java.nio.file.Files.writeString(java.nio.file.Paths.get(f), out)
          println(s"[graft] changes written to $f")
        case None => println(out)
      }
    } finally spark.stop()
  }

  final case class Args(runArgs: Validate.RunArgs, data: String, diffHtml: Boolean = false)

  def parse(argv: Array[String]): Args = {
    var ra = Validate.RunArgs()
    var data = "/root/testdata/sf0.001"
    var diffHtml = false
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--latest"    => ra = ra.copy(latest = true); i += 1
        case "--start"     => ra = ra.copy(start = Some(argv(i + 1))); i += 2
        case "--end"       => ra = ra.copy(end = Some(argv(i + 1))); i += 2
        case "--type"      => ra = ra.copy(changeType = Some(argv(i + 1))); i += 2
        case "--file"      => ra = ra.copy(file = Some(argv(i + 1))); i += 2
        case "--number"    => ra = ra.copy(number = Some(argv(i + 1))); i += 2
        case "--id"        => ra = ra.copy(id = Some(argv(i + 1))); i += 2
        case "--data"      => data = argv(i + 1); i += 2
        case "--diff-html" => diffHtml = true; i += 1
        case other         => System.err.println(s"unknown argument $other"); i += 1
      }
    }
    Args(ra, data, diffHtml)
  }

  /** Deterministic change records in the recentchanges shape (F1/F2/F9
    * filters applied per args).
    */
  def changeRecords(spark: SparkSession, dir: String, a: Args): DataFrame = {
    val limit = a.runArgs.number.map(_.toInt).getOrElse(50)
    val base = sources.Tables.read(spark, dir, "events")
      .select(
        concat(lit("Q"), col("user_id")).as("title"),
        col("event_id").as("revid"),
        when(col("event_type") === "purchase", lit(0L))
          .otherwise(col("event_id") - 1).as("old_revid"),
        when(col("event_type") === "purchase", lit("new"))
          .otherwise(lit("edit")).as("change_type"),
        col("ts")
      )
      .filter(col("title").rlike("^Q[0-9]+$"))
    val typed = a.runArgs.changeType match {
      case Some("edit") => base.filter(col("change_type") === "edit")
      case Some("new")  => base.filter(col("change_type") === "new")
      case _            => base.filter(col("change_type").isin("edit", "new"))
    }
    val ranged = (a.runArgs.start, a.runArgs.end) match {
      case (Some(s), Some(e)) => typed.filter(col("ts").between(lit(s), lit(e)))
      case _                  => typed
    }
    val idFiltered = a.runArgs.id match {
      case Some(id) => ranged.filter(col("title") === id)
      case None     => ranged
    }
    idFiltered.orderBy(col("ts").desc, col("revid").desc).limit(limit)
  }

  /** Deterministic snapshot triples per (entity, revid): a base claim plus a
    * revid-dependent value triple, so consecutive revisions differ by
    * exactly one (value) triple — the diff kernel's bread and butter.
    */
  def snapshotTriples(spark: SparkSession, dir: String): DataFrame = {
    sources.Tables.read(spark, dir, "events")
      .select(concat(lit("Q"), col("user_id")).as("entity"), col("event_id").as("revid"))
      .withColumn("t", explode(array(
        struct(lit("base").as("kind"), lit("wdt:P31").as("pred"), lit("wd:Q5").as("obj")),
        struct(lit("ver").as("kind"), lit("schema:version").as("pred"),
          concat(lit("\""), col("revid"), lit("\"^^xsd:integer")).as("obj"))
      )))
      .select(col("entity"), col("revid"),
        concat(lit("wd:"), col("entity")).as("subj"),
        col("t.pred").as("pred"), col("t.obj").as("obj"))
  }

  /** The E2 lifecycle (`--diff-html`): the reference's primary entry point —
    * get_updates.main fetches each change's compare HTML and runs
    * convert_to_rdf over it (get_updates.py:159-188, 1182), writing the
    * EDIT_DELETE_RDFS/EDIT_INSERT_RDFS blocks through write_to_file
    * (1077-1085). Here: changes → deterministic diff-table docs
    * (DiffHtmlGen, the no-network stand-in for the compare API) → the
    * distributed DiffTableRdf walk → blocks in the reference's file grammar.
    * Output is bounded by the reference's own ≤501-change contract, so the
    * driver-side collect is ≤ 5·limit blocks.
    */
  def runDiffHtml(spark: SparkSession, a: Args): String = {
    import spark.implicits._
    val changes = changeRecords(spark, a.data, a)
      .select(
        col("title").as("entity"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        col("revid").cast("long"),
        col("old_revid").cast("long"),
        regexp_extract(col("title"), "([0-9]+)", 1).cast("long").as("uid")
      )
      .as[(String, String, Long, Long, Long)]
      .map { case (e, ts, r, o, u) => (e, ts, r, o, graft.text.DiffHtmlGen.generate(u, r)) }
      .toDF("entity", "ts", "revid", "old_revid", "diff_html")
    val blocks = operators.DiffTableRdf.convert(spark, changes)
      .orderBy(col("ts").desc, col("entity").asc, col("rdf").asc)
      .collect()
    KgPipeline.goldenFile(blocks.map(_.getAs[String]("rdf")).toSeq)
  }

  /** The whole E1 lifecycle, set-based. Returns the reference-grammar
    * changes file as a string.
    */
  def run(spark: SparkSession, a: Args): String = {
    if (a.diffHtml) return runDiffHtml(spark, a)
    val changes = changeRecords(spark, a.data, a)
    val snaps = snapshotTriples(spark, a.data)

    // pair changes with new/old snapshot triples (old_revid==0 → empty old)
    val newT = changes.join(snaps,
        changes("title") === snaps("entity") && changes("revid") === snaps("revid"))
      .select(col("title"), col("old_revid"), changes("revid").as("new_revid"),
        col("subj"), col("pred"), col("obj"))
    val oldT = changes.join(snaps,
        changes("title") === snaps("entity") && changes("old_revid") === snaps("revid"))
      .select(col("title"), col("old_revid"), changes("revid").as("new_revid"),
        col("subj"), col("pred"), col("obj"))

    // both diff directions in one shuffle, per (entity, revision-pair)
    val keys = Seq("title", "old_revid", "new_revid", "subj", "pred", "obj")
    val ops = TripleDiff.diffOps(oldT, newT, keys)
      .withColumn("cmd", functions.SparqlColumns.command(
        col("op"), col("subj"), col("pred"), col("obj")))

    // per-change block assembly: DELETE commands then INSERT (diff_ttls order)
    val blocks = ops
      .groupBy(col("title"), col("old_revid"), col("new_revid"))
      .agg(
        concat_ws("\n",
          array_sort(collect_list(when(col("op") === "DELETE", col("cmd"))))).as("deletes"),
        concat_ws("\n",
          array_sort(collect_list(when(col("op") === "INSERT", col("cmd"))))).as("inserts")
      )
      .select(col("title"), col("old_revid"), col("new_revid"),
        concat_ws("\n", col("deletes"), col("inserts")).as("diff"))
      .orderBy(col("title"), col("new_revid"))
      .collect()

    KgPipeline.goldenChangesFile(
      blocks.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    )
  }
}
