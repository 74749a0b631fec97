package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q_dedup_incr — incremental near-dedup against a persisted index.
  *
  * The contract under test: applying a new batch against ONLY the
  * persisted index state (md5 set + MinHash band-bucket table) yields
  * exactly the assignment a full rebuild over base ∪ delta gives the
  * delta rows. Planted corpus exercises every path the apply side has:
  * exact md5 match to base, token-permutation near match to base (J = 1
  * through the band index, different md5), a bridge document that merges
  * TWO base clusters, a batch-internal exact + near cluster, and fresh
  * singletons. Plus the persistence round trip: indexes written to
  * parquet (band index hive-partitioned by band_idx), read back, and the
  * delta applied from the files alone.
  */
class IncrementalDedupSpec extends SparkSpec {

  import ops.DedupOps

  private val A = (0 until 20).map(i => f"alpha$i%02d").mkString(" ")
  private val Aperm = (0 until 20).reverse.map(i => f"alpha$i%02d").mkString(" ")
  private val Z = (0 until 20).map(i => f"zeta$i%02d")
  private val X = Z.take(18).mkString(" ") // Z minus z18,z19: J(X,Z)=0.9
  private val Y = (Z.take(16) ++ Z.drop(18)).mkString(" ") // J(Y,Z)=0.9, J(X,Y)=0.8
  private val Zt = Z.mkString(" ")
  private val C = (0 until 10).map(i => f"gamma$i%02d").mkString(" ")
  private val D = (0 until 20).map(i => f"delta$i%02d").mkString(" ")
  private val Dperm = (0 until 20).reverse.map(i => f"delta$i%02d").mkString(" ")
  private val N = (0 until 10).map(i => f"nu$i%02d").mkString(" ")
  private val Nperm = (0 until 10).reverse.map(i => f"nu$i%02d").mkString(" ")

  private def frame(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text")
  }

  private lazy val base = frame(Seq(
    0L -> A, // cluster 0: exact dup (1), permutation (2)
    1L -> A,
    2L -> Aperm,
    3L -> X, // clusters 3 and 4: J(X,Y)=0.8 — separate until the bridge
    4L -> Y,
    5L -> C, // singleton, later md5-matched by 107
    6L -> D, // cluster 6: permutation pair
    7L -> Dperm,
    8L -> "solo eight unique words here",
    9L -> "nine other words entirely distinct"))

  private lazy val delta = frame(Seq(
    100L -> A, // exact md5 match -> base cluster 0
    101L -> Aperm, // permutation: near match through the band index -> 0
    102L -> Zt, // bridge: J=0.9 to BOTH 3 and 4 -> merges them, label 3
    103L -> N, // new batch-internal cluster: exact pair + permutation
    104L -> N,
    105L -> Nperm,
    106L -> "fresh new delta content alone", // new singleton
    107L -> C)) // exact md5 match -> base cluster 5

  private def assignMap(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("delta-apply over the index equals full rebuild on the unioned corpus") {
    val (md5Index, bandIndex) = DedupOps.buildDedupIndex(spark, base)
    val incr = assignMap(DedupOps.applyDedupDelta(spark, delta, md5Index, bandIndex))
    val full = assignMap(DedupOps.fullAssign(spark, base.unionByName(delta)))
    val fullDelta = full.filter { case (id, _) => id >= 100L }
    assert(incr === fullDelta)
    // every apply path is exercised and lands where designed:
    assert(incr(100L) === 0L, "exact md5 match joins its base cluster")
    assert(incr(101L) === 0L, "permutation joins base through the band index")
    assert(incr(102L) === 3L, "bridge doc merges base clusters 3 and 4")
    assert(full(4L) === 3L, "the bridge merged the base clusters in the rebuild")
    assert(incr(103L) === 103L && incr(104L) === 103L && incr(105L) === 103L,
      "batch-internal exact + near cluster closes on its min id")
    assert(incr(106L) === 106L, "fresh content opens a new singleton cluster")
    assert(incr(107L) === 5L, "exact match to a base singleton adopts its id")
  }

  test("apply from the parquet-persisted index reproduces the in-memory apply") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-index").toString
    val (md5Index, bandIndex) = DedupOps.buildDedupIndex(spark, base)
    val inMem = assignMap(DedupOps.applyDedupDelta(spark, delta, md5Index, bandIndex))
    // the production layout: md5 set flat, band buckets hive-partitioned on
    // band_idx so a probe batch's scan is prunable to the bands it hashes to
    md5Index.write.mode("overwrite").parquet(s"$dir/md5_index")
    bandIndex.write.mode("overwrite").partitionBy("band_idx")
      .parquet(s"$dir/band_index")
    val md5Back = spark.read.parquet(s"$dir/md5_index")
    val bandBack = spark.read.parquet(s"$dir/band_index")
      .select("band_idx", "band_val", "lang", "n", "th", "cluster_id")
    val fromDisk = assignMap(DedupOps.applyDedupDelta(spark, delta, md5Back, bandBack))
    assert(fromDisk === inMem)
  }

  test("q_dedup_incr on testdata equals the full q_dedup_cc labels for the batch") {
    import spark.implicits._
    val incr = SparkEntry.queries("q_dedup_incr")(spark, sf)
      .select("doc_id", "cluster_id")
    val thr = T(spark, sf, "documents")
      .agg(expr("(max(doc_id) * 9) div 10")).head().getLong(0)
    val full = SparkEntry.queries("q_dedup_cc")(spark, sf)
      .filter($"doc_id" > thr)
      .select("doc_id", "cluster_id")
    assert(assignMap(incr) === assignMap(full))
  }
}
