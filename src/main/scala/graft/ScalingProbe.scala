package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Diagnostic: runs the Bench scaling job at a given core count with
  * per-stage wall/cpu breakdown, to localize scaling bottlenecks.
  * Usage: runMain graft.ScalingProbe <cores> <rep> [runs]
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val rep = args(1).toInt
    val runs = if (args.length > 2) args(2).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        math.max(cores * sys.env.getOrElse("SPARK_GRAFT_PARTS_PER_CORE", "2").toInt, 8))
      .config("spark.sql.adaptive.coalescePartitions.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE_COALESCE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val run = si.taskMetrics.executorRunTime / 1000.0
        val gc = si.taskMetrics.jvmGCTime / 1000.0
        val spill = si.taskMetrics.memoryBytesSpilled / 1e6
        val shw = si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6
        println(f"[stage ${si.stageId}%3d] ${si.name.take(40)}%-40s tasks=${si.numTasks}%4d wall=$wall%7.2fs taskRun=$run%8.1fs cpu=$cpu%8.1fs gc=$gc%6.1fs spill=$spill%8.0fMB shufW=$shw%8.0fMB")
      }
    })
    if (args.contains("--warm2")) {
      val t0 = System.nanoTime()
      BenchJobs.replicatedTriples(spark, sfDir, 2, cores * 4).count()
      println(f"[probe] warmup rep=2 wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    args.find(_.startsWith("--sleep=")).foreach { s =>
      val sec = s.substring(8).toInt
      println(s"[probe] sleeping $sec s to let C2 drain")
      Thread.sleep(sec * 1000L)
    }
    (1 to runs).foreach { r =>
      val t0 = System.nanoTime()
      val n = BenchJobs.replicatedTriples(spark, sfDir, rep, cores * 4).count()
      println(f"[probe] cores=$cores rep=$rep run=$r triples=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
