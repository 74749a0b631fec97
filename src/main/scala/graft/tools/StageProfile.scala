package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage breakdown of ONE registered query: stage id, task count,
  * executor-run task-seconds, and the first call-site line — which
  * operator family each stage belongs to. Warm once, then one measured
  * run. Usage: runMain graft.tools.StageProfile <name> [sfDir]
  * Not part of the driver contract.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall =
          (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        val site = si.details.linesIterator
          .find(l => l.contains("graft") || l.contains("Ops.scala"))
          .getOrElse(si.name).trim
        rows.add(
          f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%3d taskSec=${si.taskMetrics.executorRunTime / 1e3}%7.2f wall=$wall%6.2f  $site")
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    rows.forEach(r => println(r))
    println(f"[stage] TOTAL wall=$dt%.2f s")
    spark.stop()
  }
}
