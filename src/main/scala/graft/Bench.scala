package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: absorb JVM/codegen/file-listing startup cost so the
    // first measured query isn't charged ~4s of one-time initialization.
    // Untimed warmup, two parts:
    //  1. full scan of every table (noop sink reads all column pages), so
    //     no measured query is charged the first-touch I/O of its inputs;
    //  2. every query once at the smallest scale factor — the schemas are
    //     identical, so the generated whole-stage-codegen classes are the
    //     same ones the measured run needs: compilation and JIT happen
    //     here instead of inside the first measured query.
    try {
      graft.T(spark, sfDir, "events").limit(1000).groupBy("event_type").count().count()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(t =>
          graft.T(spark, sfDir, t).write.mode("overwrite").format("noop").save())
      val warmDir = new java.io.File(new java.io.File(sfDir).getParent, "sf0.001")
      if (warmDir.isDirectory) {
        val wd = warmDir.getAbsolutePath
        SparkEntry.queries.foreach { case (_, fn) =>
          try fn(spark, wd).write.mode("overwrite").format("noop").save()
          catch { case _: Throwable => () }
        }
      }
    } catch { case _: Throwable => () }
    System.gc() // drop warmup garbage so no measured query eats the pause
    // name order: stable across rounds, so per-query numbers are comparable
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes every output column; count() would let the
      // optimizer prune the very expressions being measured
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
