package graft
import org.apache.spark.sql.SparkSession

/** Dev diagnostic: prints shuffle/broadcast counts of the physical plan per
  * query — the quick "is this the plan I'd want at 100×" audit loop
  * (PlanSpec pins the load-bearing shapes in CI; this main is for eyeballing
  * new queries before choosing what to pin). Audited 2026-08-16: q51 1/0,
  * q54 3/2, q55 6/2, q56 1/3 (fact side shuffles once, dims broadcast),
  * q57 0/0, q27-gate 3/1.
  */
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // optional arg: audit specific queries by name (default: the historical
    // eyeball set); with SPARK_GRAFT_AUDIT_TIME=1, also run each query
    // twice (warm + timed) and report wall + task-seconds — the quick
    // "where does the time go" loop without a full bench run
    val all: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "q51" -> (Queries.q51AnnMulti _), "q54" -> (Queries.q54Boilerplate _),
      "q55" -> (Queries.q55Nodes _), "q56" -> (Queries.q56EmbedLink _),
      "q57" -> (Queries.q57PiiRedact _), "q27g" -> (Queries.q27SimHashGate _),
      "q26" -> (Queries.q26MinHashPairs _), "q75" -> (Queries.q75MinHashStored _),
      "q49" -> (Queries.q49Components _), "q67" -> (Queries.q67CurateCorpus _))
    val picked = if (args.isEmpty) all.take(6) else all.filter(q => args.contains(q._1))
    val unknown = args.filterNot(all.map(_._1).contains)
    require(unknown.isEmpty,
      s"unknown audit queries: ${unknown.mkString(", ")} (known: ${all.map(_._1).mkString(", ")})")
    val timeIt = sys.env.get("SPARK_GRAFT_AUDIT_TIME").contains("1")
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    if (timeIt) spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
    })
    picked.foreach { case (n, f) =>
      val df = f(spark, dir)
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val sh = p.collect { case e: ShuffleExchangeLike => e }.size
      val bc = p.collect { case e: BroadcastExchangeLike => e }.size
      if (timeIt) {
        f(spark, dir).count() // warm
        org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
        val t0v = taskMs.get(); val t0 = System.nanoTime()
        f(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
        println(f"[audit] $n shuffles=$sh broadcasts=$bc wall=$wall%.2fs task=${(taskMs.get() - t0v) / 1000.0}%.2fs")
      } else println(s"[audit] $n shuffles=$sh broadcasts=$bc")
    }
    spark.stop()
  }
}
