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
    val dir = "/root/testdata/sf0.001"
    Seq("q51" -> (Queries.q51AnnMulti _), "q54" -> (Queries.q54Boilerplate _),
        "q55" -> (Queries.q55Nodes _), "q56" -> (Queries.q56EmbedLink _),
        "q57" -> (Queries.q57PiiRedact _), "q27g" -> (Queries.q27SimHashGate _)).foreach { case (n, f) =>
      val df = f(spark, dir)
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val sh = p.collect { case e: ShuffleExchangeLike => e }.size
      val bc = p.collect { case e: BroadcastExchangeLike => e }.size
      println(s"[audit] $n shuffles=$sh broadcasts=$bc")
    }
    spark.stop()
  }
}
