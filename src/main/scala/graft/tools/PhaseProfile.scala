package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query phase profile: separates Catalyst planning time (analyze +
  * optimize + physical planning, forced via executedPlan) from execution
  * time (noop sink on the pre-planned frame), plus a composed end-to-end
  * time matching Bench's methodology. At bench scale (sf0.1, tables of a
  * few MB) fixed per-query overheads — planning, job count, exchange
  * count — dominate over bytes, so this split tells which lever to pull.
  * Usage: runMain graft.tools.PhaseProfile [sfDir] [q1,q2,...] [iters]
  * Not part of the driver contract.
  */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args.length > 1 && args(1).nonEmpty) args(1).split(',').toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm: tables + one full pass of each query at the smallest sf
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try graft.T(spark, sfDir, t).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    for (name <- names)
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => println(s"[phase] warm $name FAILED: $e") }
    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // job/stage/task-time counters: at bench scale fixed per-job overheads
    // rival byte costs, so the job count per query is a first-class metric
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
    })
    for (name <- names) {
      try {
        val fn = graft.SparkEntry.queries(name)
        val plans = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.queryExecution.executedPlan // force analysis->physical planning
          (System.nanoTime() - t0) / 1e9
        }.min
        val (gc0, j0, st0, tm0) = (gcMillis(), jobs.get, stages.get, taskMs.get)
        val full = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        // let listener events drain (bus is async): poll until the
        // counters are stable for two consecutive 50 ms checks (ADVICE
        // r18: a fixed sleep can under-wait under load; the listener bus
        // itself is private[spark], so stability polling is the seam)
        var stable = 0
        var last = (jobs.get, stages.get, taskMs.get)
        var waited = 0
        while (stable < 2 && waited < 2000) {
          Thread.sleep(50); waited += 50
          val now = (jobs.get, stages.get, taskMs.get)
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
        val gcd = (gcMillis() - gc0) / 1e3 / iters
        val (jd, std, tmd) =
          ((jobs.get - j0) / iters, (stages.get - st0) / iters,
            (taskMs.get - tm0) / 1e3 / iters)
        println(f"[phase] $name%-28s plan=$plans%6.3f full=$full%6.3f gc=$gcd%5.2f jobs=$jd%3d stages=$std%3d taskSec=$tmd%7.2f")
      } catch { case e: Throwable => println(s"[phase] $name FAILED: $e") }
    }
    spark.stop()
  }
}
