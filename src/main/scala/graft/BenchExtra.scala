package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev diagnostic (guide §1.4): stage-isolated timings for the expensive
  * headline queries, each computed with the noop sink so we time the
  * computation, not the sink, with per-stage task-seconds from a stage
  * listener. NOT part of the driver contract — Bench.scala is the frozen
  * artifact; this main exists to attribute its task-seconds to operators.
  *
  * Usage: runMain graft.BenchExtra [stage names...]
  */
object BenchExtra {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-benchextra-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores * 4, 16))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    import spark.implicits._
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val verboseStages = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
        if (verboseStages.get())
          println(f"[stage] id=${sc.stageInfo.stageId}%4d tasks=${sc.stageInfo.numTasks}%4d " +
            f"runMs=${sc.stageInfo.taskMetrics.executorRunTime}%7d " +
            f"cpuMs=${sc.stageInfo.taskMetrics.executorCpuTime / 1000000}%7d " +
            f"gcMs=${sc.stageInfo.taskMetrics.jvmGCTime}%6d " +
            s"name=${sc.stageInfo.name.takeWhile(_ != '\n').take(60)}")
      }
    })

    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    def time(name: String)(thunk: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      thunk // warm, untimed
      var bestWall = Double.MaxValue
      var bestTask = Double.MaxValue
      (1 to 2).foreach { _ =>
        System.gc()
        org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
        val t0m = taskMs.get(); val t0 = System.nanoTime()
        thunk
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
        val task = (taskMs.get() - t0m) / 1000.0
        if (wall < bestWall) bestWall = wall
        if (task < bestTask) bestTask = task
      }
      println(f"[extra] $name%-28s wall $bestWall%7.3f s   task $bestTask%8.3f s")
      spark.sparkContext.setJobDescription(null)
    }

    val want: String => Boolean = n => args.isEmpty || args.exists(n.startsWith)

    // warm the common inputs (Bench does the same untimed first-touch)
    Seq("documents", "events", "orders").foreach(n =>
      graft.sources.Tables.read(spark, dir, n).count())

    // ---- pure-Scala kernel cost, driver-side (no Spark at all)
    if (want("kernel")) {
      val texts = graft.sources.Tables.read(spark, dir, "documents")
        .select(col("text")).as[String].collect()
      val family = graft.functions.Sketches.hashFamily(64)
      def burn(): Long = {
        var acc = 0L
        texts.foreach { t =>
          val sig = graft.functions.Sketches.minHash(graft.functions.Sketches.shingles(t, 5), family)
          acc ^= sig(0)
        }
        acc
      }
      burn() // warm
      val t0 = System.nanoTime(); val a = burn()
      println(f"[extra] kernel_minhash_${texts.length}docs  wall ${(System.nanoTime() - t0) / 1e9}%7.3f s  (acc=$a)")
    }

    // ---- diff-walk kernel, driver-side: generate / parse / full walk
    if (want("kdiff")) {
      val n = 20000
      def genAll(): Long = {
        var acc = 0L
        var i = 0
        while (i < n) { acc += graft.text.DiffHtmlGen.generate(i % 997, i).length; i += 1 }
        acc
      }
      val htmls = (0 until n).map(i => graft.text.DiffHtmlGen.generate(i % 997, i)).toArray
      def parseAll(): Long = {
        var acc = 0L
        var i = 0
        while (i < n) { acc += graft.text.Html.parse(htmls(i)).children.length; i += 1 }
        acc
      }
      def walkAll(): Long = {
        var acc = 0L
        var i = 0
        while (i < n) {
          acc += graft.text.DiffHtml.convertToRdf(htmls(i), "Q" + (i % 997), "2024-01-01 00:00:00",
            i.toLong, i - 1L).length
          i += 1
        }
        acc
      }
      genAll(); parseAll(); walkAll() // warm
      var t0 = System.nanoTime(); genAll()
      println(f"[extra] kdiff_gen_${n}      wall ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      t0 = System.nanoTime(); parseAll()
      println(f"[extra] kdiff_parse_${n}    wall ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      t0 = System.nanoTime(); walkAll()
      println(f"[extra] kdiff_walk_${n}     wall ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }

    val docs = graft.sources.Tables.read(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)

    if (want("sig_sketch"))
      time("sig_sketch_noop") {
        noop(graft.operators.Dedup.minHashSignatures(spark, docs, "doc_id", "text"))
      }

    lazy val sigPath = Queries.sigLayoutForDiagnostics(spark, dir)
    if (want("sig_read"))
      time("sig_read_noop") { noop(spark.read.parquet(sigPath)) }

    if (want("banded"))
      time("banded_noop") {
        noop(graft.operators.Dedup.bandedForDiagnostics(spark, spark.read.parquet(sigPath), 16))
      }

    if (want("pairs")) {
      time("pairs_join_noop") {
        val keys = graft.operators.Dedup.bandedForDiagnostics(spark, spark.read.parquet(sigPath), 16)
        val l = keys.select(col("band"), col("bkey"), col("id").as("id1"))
        val r = keys.select(col("band"), col("bkey"), col("id").as("id2"))
        noop(l.join(r, Seq("band", "bkey")).filter(col("id1") < col("id2"))
          .select(col("id1"), col("id2")).dropDuplicates("id1", "id2"))
      }
    }

    if (want("pjo")) {
      val keys = graft.operators.Dedup.bandedForDiagnostics(spark, spark.read.parquet(sigPath), 16)
      val l = keys.select(col("band"), col("bkey"), col("id").as("id1"))
      val r = keys.select(col("band"), col("bkey"), col("id").as("id2"))
      val joined = l.join(r, Seq("band", "bkey")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"))
      time("pjo_join_only_noop") { noop(joined) }
      println(joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    if (want("pjd")) {
      val keys = graft.operators.Dedup.bandedForDiagnostics(spark, spark.read.parquet(sigPath), 16)
      val l = keys.select(col("band"), col("bkey"), col("id").as("id1"))
      val r = keys.select(col("band"), col("bkey"), col("id").as("id2"))
      val joined = l.join(r, Seq("band", "bkey")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2")).dropDuplicates("id1", "id2")
      verboseStages.set(true)
      time("pjd_join_dropdup_noop") { noop(joined) }
      verboseStages.set(false)
      println(joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    if (want("pjc")) {
      val keys = graft.operators.Dedup.bandedForDiagnostics(
        spark, spark.read.parquet(sigPath).coalesce(4), 16)
      val l = keys.select(col("band"), col("bkey"), col("id").as("id1"))
      val r = keys.select(col("band"), col("bkey"), col("id").as("id2"))
      val joined = l.join(r, Seq("band", "bkey")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2")).dropDuplicates("id1", "id2")
      verboseStages.set(true)
      time("pjc_coalesce4_noop") { noop(joined) }
      verboseStages.set(false)
    }

    if (want("bucketstats")) {
      val keys = graft.operators.Dedup.bandedForDiagnostics(spark, spark.read.parquet(sigPath), 16)
      val sizes = keys.groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("k"))
      val st = sizes.agg(
        count(lit(1)).as("n_buckets"), max(col("k")).as("max_k"),
        sum(col("k") * col("k")).as("sum_k2")).head()
      println(s"[extra] bucketstats n_buckets=${st.getLong(0)} max_k=${st.getLong(1)} sum_k2=${st.getLong(2)}")
      val top = sizes.orderBy(col("k").desc).limit(10).collect()
        .map(r => r.getLong(2)).mkString(",")
      println(s"[extra] top bucket sizes: $top")
    }

    if (want("v75")) {
      verboseStages.set(true)
      time("v75_full") { Queries.q75MinHashStored(spark, dir).count() }
      verboseStages.set(false)
    }

    if (want("q75")) time("q75_full") { Queries.q75MinHashStored(spark, dir).count() }
    if (want("q26")) time("q26_full") { Queries.q26MinHashPairs(spark, dir).count() }
    if (want("v26")) {
      verboseStages.set(true)
      time("v26_full") { Queries.q26MinHashPairs(spark, dir).count() }
      verboseStages.set(false)
    }
    if (want("q77")) time("q77_full") { Queries.q77MinHashIncremental(spark, dir).count() }

    if (want("q44gen"))
      time("q44_gen_noop") {
        val changes = graft.sources.Tables.read(spark, dir, "events")
          .repartition(spark.sparkContext.defaultParallelism)
          .select(
            concat(lit("Q"), col("user_id")).as("entity"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
            col("event_id").cast("long").as("revid"),
            (col("event_id") - 1).cast("long").as("old_revid"),
            col("user_id").cast("long").as("uid"),
            col("event_id").cast("long").as("eid")
          )
          .as[(String, String, Long, Long, Long, Long)]
          .mapPartitions(_.map { case (e, ts, r, o, u, ev) =>
            (e, ts, r, o, graft.text.DiffHtmlGen.generate(u, ev))
          })
          .toDF("entity", "ts", "revid", "old_revid", "diff_html")
        noop(changes)
      }
    if (want("q44")) time("q44_full") { Queries.q44DiffHtml(spark, dir).count() }

    if (want("q19")) time("q19_noop") { noop(Queries.q19LinkTop1(spark, dir)) }
    if (want("q20")) time("q20_full") { Queries.q20Triples(spark, dir).count() }
    if (want("q23")) time("q23_full") { Queries.q23TripleDiff(spark, dir).count() }
    if (want("q49")) time("q49_full") { Queries.q49Components(spark, dir).count() }
    if (want("q67")) time("q67_full") { Queries.q67CurateCorpus(spark, dir).count() }
    if (want("v67")) {
      verboseStages.set(true)
      time("v67_full") { Queries.q67CurateCorpus(spark, dir).count() }
      verboseStages.set(false)
    }
    if (want("v49")) {
      verboseStages.set(true)
      time("v49_full") { Queries.q49Components(spark, dir).count() }
      verboseStages.set(false)
    }
    if (want("q40")) time("q40_full") { Queries.q40Pipeline(spark, dir).count() }

    spark.stop()
  }
}
