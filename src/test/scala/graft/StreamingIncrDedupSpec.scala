package graft

import java.nio.file.Files

import graft.ops.{DedupOps, StreamOps}
import org.apache.spark.sql.DataFrame

/** Continuous incremental dedup ([[StreamOps.incrDedupStreamWriter]]):
  * micro-batched apply-with-index-maintenance must produce, across ALL
  * batches, exactly the assignment a one-shot full rebuild over
  * base ∪ delta gives the delta rows — including the two effects only
  * index maintenance can deliver:
  *
  *  - content first seen in batch k is matchable in batch k+1 (both the
  *    exact md5 path against the appended group and the banded near path
  *    against the appended band rows);
  *  - a batch-k bridge doc merges two base clusters, and a batch-k+1 doc
  *    near the MERGED side's content gets the surviving label (the index
  *    remap in action).
  *
  * Plus the exactly-once shape: versioned snapshot dirs, deterministic
  * under a fresh checkpoint + fresh index rerun.
  */
class StreamingIncrDedupSpec extends SparkSpec {

  private val A = (0 until 20).map(i => f"alpha$i%02d").mkString(" ")
  private val Z = (0 until 20).map(i => f"zeta$i%02d")
  private val X = Z.take(18).mkString(" ")
  private val Y = (Z.take(16) ++ Z.drop(18)).mkString(" ")
  private val Zt = Z.mkString(" ")
  private val C = (0 until 10).map(i => f"gamma$i%02d").mkString(" ")
  private val N = (0 until 10).map(i => f"nu$i%02d").mkString(" ")
  private val Nperm = (0 until 10).reverse.map(i => f"nu$i%02d").mkString(" ")
  private val Yperm = (Z.take(16) ++ Z.drop(18)).reverse.mkString(" ")

  private def frame(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, "en", t, "synthetic", t.length.toLong) }
      .toDF("doc_id", "lang", "text", "source", "n_chars")
  }

  private lazy val base = frame(Seq(
    0L -> A,
    3L -> X, // clusters 3 and 4: J(X,Y)=0.8 — separate until bridged
    4L -> Y,
    5L -> C,
    8L -> "solo eight unique words here"))

  // batch 1: bridge + brand-new content; batch 2: probes content first
  // seen in batch 1 (exact AND near) plus the remapped merged cluster
  private lazy val batch1 = frame(Seq(
    100L -> Zt, // bridge: merges base clusters 3 and 4 -> 3
    101L -> N, // new cluster 103? no - new cluster 101
    102L -> "fresh new delta content alone"))
  private lazy val batch2 = frame(Seq(
    200L -> N, // exact md5 match to batch-1 content -> 101
    201L -> Nperm, // near match to batch-1 content through appended bands -> 101
    202L -> Yperm, // near match to REMAPPED base rows (old cluster 4) -> 3
    203L -> C)) // exact match to base content, untouched by the churn -> 5

  private def runStream(srcDir: String, indexDir: String): Map[Long, Long] = {
    StreamOps.seedDedupIndex(
      spark, base.select("doc_id", "lang", "text"), indexDir)
    val q = StreamOps
      .incrDedupStreamWriter(
        StreamOps.docsStream(
          spark, s"$srcDir/documents.parquet", Map("maxFilesPerTrigger" -> "1")),
        indexDir,
        Files.createTempDirectory("graft_incr_ckpt").toString)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    StreamOps
      .readDedupAssignments(spark, indexDir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  private def stageSource(): String = {
    val dir = Files.createTempDirectory("graft_incr_src").toString
    val docs = s"$dir/documents.parquet"
    batch1.coalesce(1).write.parquet(s"$dir/b1")
    batch2.coalesce(1).write.parquet(s"$dir/b2")
    // one parquet FILE per micro-batch, ordered: the file source picks
    // oldest-modified first and maxFilesPerTrigger=1 splits the triggers
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(docs))
    def files(sub: String) = fs
      .listStatus(new org.apache.hadoop.fs.Path(s"$dir/$sub"))
      .filter(_.getPath.getName.endsWith(".parquet"))
    files("b1").zipWithIndex.foreach { case (f, i) =>
      fs.rename(f.getPath, new org.apache.hadoop.fs.Path(s"$docs/batch1_$i.parquet"))
    }
    files("b2").zipWithIndex.foreach { case (f, i) =>
      fs.rename(f.getPath, new org.apache.hadoop.fs.Path(s"$docs/batch2_$i.parquet"))
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/b1"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/b2"), true)
    new java.io.File(s"$docs/batch1_0.parquet").setLastModified(1000000L)
    new java.io.File(s"$docs/batch2_0.parquet").setLastModified(2000000L)
    dir
  }

  test("sequential micro-batch apply equals the one-shot full rebuild") {
    val got = runStream(
      stageSource(), Files.createTempDirectory("graft_incr_idx").toString)
    val want = DedupOps
      .fullAssign(
        spark,
        base.unionByName(batch1).unionByName(batch2)
          .select("doc_id", "lang", "text"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._1 >= 100L)
      .toMap
    assert(got === want)
    // the effects only index maintenance can produce:
    assert(got(200L) === 101L, "batch-2 exact match to batch-1 content")
    assert(got(201L) === 101L, "batch-2 near match through batch-1's appended bands")
    assert(got(202L) === 3L, "batch-2 near match to rows remapped by the batch-1 bridge")
    assert(got(203L) === 5L, "base content untouched by the churn keeps its label")
  }

  test("fresh checkpoint + fresh index rerun reproduces the assignment exactly") {
    val src = stageSource()
    val first = runStream(src, Files.createTempDirectory("graft_incr_idx").toString)
    val second = runStream(src, Files.createTempDirectory("graft_incr_idx").toString)
    assert(first === second)
    assert(first.nonEmpty)
  }
}
