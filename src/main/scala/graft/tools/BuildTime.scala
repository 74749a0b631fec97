package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a fresh bm25 index build under a temp warehouse root (iteration
  * aid for the r19 write-path change; not part of the driver contract).
  * Usage: runMain graft.tools.BuildTime [sfDir] [iters]
  */
object BuildTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.T(spark, sfDir, "documents")
      .write.mode("overwrite").format("noop").save()
    for (i <- 1 to iters) {
      val root = java.nio.file.Files
        .createTempDirectory("graft_buildtime").toString
      spark.conf.set(graft.index.GenLog.RootKey, root)
      val t0 = System.nanoTime()
      graft.ops.TextOps.writeBm25Index(spark, sfDir)
      println(f"[buildtime] bm25 build ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
