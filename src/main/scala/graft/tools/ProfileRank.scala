package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness for the rank/cc family (round-17 task #2):
  * times each registry query and prints the cc loop's debug lines.
  * Not part of the driver contract.
  */
object ProfileRank {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_dedup_rank", "q_dedup_cc", "q_dedup_rank_rep")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm: full pass of each once
    for (n <- names)
      graft.SparkEntry.queries(n)(spark, d).write.mode("overwrite").format("noop").save()
    for (n <- names; _ <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, d).write.mode("overwrite").format("noop").save()
      println(f"[profile] $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
