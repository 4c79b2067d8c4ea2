package graft

import org.apache.spark.sql.SparkSession

/** Smoke runner: drives SparkEntry.entry (the flagship pipeline) exactly as
  * the driver's rows>0 check does, and prints the plan + a sample.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    df.show(10, truncate = false)
    if (args.contains("--explain")) df.explain("formatted")
    spark.stop()
    assert(n > 0, "flagship entry returned zero rows")
  }
}
