package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Multi-executor correctness harness, driven by LocalClusterSpec: runs
  * a representative query slice on `local-cluster[2,4,2048]` — Spark's
  * standalone-cluster test mode, where each executor is a SEPARATE JVM
  * process — and dumps the results for the spec to compare against the
  * single-JVM `local[*]` answers.
  *
  * Everything else in the repo runs local[*]: one JVM, so the custom
  * codegen expressions (TokenKernels, DotProduct, PlaneSignBits,
  * CodebookScores), the TopKAgg UDAF, broadcast variables, and task
  * binaries never cross a real serialization boundary there. This main
  * is the cheapest honest way to cross one: local-cluster launches real
  * CoarseGrainedExecutorBackend processes (task bytes, broadcasts, and
  * results all pass through Java/Kryo serialization and the block
  * manager's RPC), while staying inside one host and one filesystem so
  * the run stays CI-bounded.
  *
  * args: `<sfDir> <outDir>`. Prints one `[cluster]` line with the
  * executor-process count (driver excluded — must be 2) and the query
  * count; any query failure exits nonzero.
  */
object ClusterCheck {

  /** The slice: every custom-kernel family that has never crossed an
    * executor boundary — fused token/minhash/simhash kernels, the
    * embedding dot-product and hyperplane-sign expressions, the TopKAgg
    * UDAF, sketch merge, codebook scoring, the md5 passage-gram ladder —
    * plus one served-index path per catalog family (buildOnce + pruned
    * reads under a shared filesystem root) and a broadcast join.
    */
  private[graft] val Queries = Seq(
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_lsh",
    "q_dedup_embed",
    "q_agg_topk",
    "q_agg_sketch_merge",
    "q_sim_quantized",
    "q_sim_served",
    "q_index_bm25_served",
    "q_join_broadcast",
    "q_text_passage_dup50",
    // round-13 batch 2: the closure kernel (localCheckpoint blocks live
    // on executor block managers; the bounded driver finish collects
    // across RPC) and the LM ladder's decimal aggregation
    "q_dedup_passage_cc",
    "q_lm_bigram_score")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName("graft-cluster-check")
      // executor JVMs are launched by the in-process Worker with THIS
      // classpath (the graft classes live on the test JVM's classpath,
      // not in a submitted jar) and the same JDK17 module opens the
      // driver fork carries
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config(
        "spark.executor.extraJavaOptions",
        Seq(
          "java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar",
        ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" "))
      .config("spark.executor.memory", "1024m")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // make sure both executor processes registered before measuring —
      // a query could otherwise run single-executor and prove nothing
      val deadline = System.currentTimeMillis() + 120000L
      def executors(): Int =
        spark.sparkContext.getExecutorMemoryStatus.size - 1 // minus driver
      while (executors() < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(200L)
      val execs = executors()
      Queries.foreach { n =>
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").parquet(s"$outDir/$n")
      }
      println(s"[cluster] executors=$execs queries=${Queries.size}")
    } finally spark.stop()
  }
}
