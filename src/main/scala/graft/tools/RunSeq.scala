package graft.tools
import org.apache.spark.sql.SparkSession

/** Run a comma-separated sequence of registered queries repeatedly in ONE
  * session and print per-run wall times — the cross-query interaction
  * probe RunOne is too narrow for (e.g. heap pressure from an earlier
  * query's explode inflating a later window query).
  * Usage: runMain graft.tools.RunSeq <n1,n2,...> <sfDir> [rounds]
  */
object RunSeq {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to rounds; name <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"[runseq] round $r $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
