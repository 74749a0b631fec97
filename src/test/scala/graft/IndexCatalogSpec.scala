package graft

import java.nio.file.Files

import graft.index.GenLog
import graft.ops.{SimilarityOps, StreamOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared index catalog ([[graft.index.GenLog]]): build-once-serve-
  * many under a configurable warehouse root, commit-marker crash safety
  * (a partial snapshot can never supersede the generations it folds),
  * full-snapshot pruning, and the queryable manifest.
  */
class IndexCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def fsOf(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("build-once: a second build call for committed params is a no-op") {
    val dir = s"${Files.createTempDirectory("graft_cat_once")}/idx"
    var builds = 0
    def build(): Boolean = GenLog.buildOnce(spark, dir) {
      builds += 1
      SimilarityOps.writeAnnIndexFor(
        spark, T(spark, sf, "embeddings"), dir)
    }
    val (runs0, skips0) = (GenLog.buildsRun.get(), GenLog.buildsSkipped.get())
    assert(build() === true && builds === 1)
    assert(build() === false && builds === 1, "second build must skip")
    // the bench's catalog observability counters track exactly this
    assert(GenLog.buildsRun.get() - runs0 === 1L)
    assert(GenLog.buildsSkipped.get() - skips0 === 1L)

    // and through the public dataset-keyed path: no file is rewritten
    val canonical = s"${SimilarityOps.serveRoot(spark, sf)}/ann"
    SimilarityOps.writeAnnIndex(spark, sf, canonical)
    def newestMtime(d: String): Long = {
      val it = fsOf(d).listFiles(new org.apache.hadoop.fs.Path(d), true)
      var m = 0L
      while (it.hasNext) { val f = it.next(); if (f.isFile) m = math.max(m, f.getModificationTime) }
      m
    }
    val before = newestMtime(canonical)
    SimilarityOps.writeAnnIndex(spark, sf, canonical)
    assert(newestMtime(canonical) === before, "re-request must not rewrite")
  }

  test("the warehouse root is configurable and dataset-keyed") {
    val custom = Files.createTempDirectory("graft_cat_root").toString
    val prior = spark.conf.getOption(GenLog.RootKey)
    spark.conf.set(GenLog.RootKey, custom)
    try {
      assert(SimilarityOps.serveRoot(spark, sf).startsWith(custom))
      val path = s"${SimilarityOps.serveRoot(spark, sf)}/ann"
      SimilarityOps.writeAnnIndex(spark, sf, path)
      assert(fsOf(custom).exists(new org.apache.hadoop.fs.Path(path)))
      // the index under the custom root serves identically
      assert(
        rows(SimilarityOps.serveAnnBatch(
          spark, path, SimilarityOps.batchProbeFrame(spark, sf))) ===
          rows(SparkEntry.queries("q_sim_batch")(spark, sf)))
      // two datasets never collide under one root
      assert(
        GenLog.datasetRoot(spark, "/a/b") !== GenLog.datasetRoot(spark, "/a/c"))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(GenLog.RootKey, v)
        case None    => spark.conf.unset(GenLog.RootKey)
      }
    }
  }

  test("an uncommitted (crashed) full snapshot never supersedes generations") {
    val dir = Files.createTempDirectory("graft_cat_crash").toString
    val all = T(spark, sf, "embeddings")
    val cut = all.agg(max($"vec_id")).head().getLong(0) * 8 / 10
    StreamOps.seedAnnIndex(spark, all.filter($"vec_id" <= cut), dir)
    // a "streamed" generation, committed through the kernel protocol
    SimilarityOps.writeAnnIndexFor(
      spark, all.filter($"vec_id" > cut), s"$dir/v1/gen")
    GenLog.markCommitted(spark, s"$dir/v1/gen")
    val probes = SimilarityOps.batchProbeFrame(spark, sf)
    val want = rows(SparkEntry.queries("q_sim_batch")(spark, sf))
    assert(rows(StreamOps.serveAnnContinuous(spark, dir, probes)) === want)

    // simulate a compaction that crashed mid-write: a partial v1/full
    // with data files but NO commit marker
    all.filter($"vec_id" <= cut / 2)
      .select($"vec_id", $"embedding", lit(0d).as("n2"), lit(0L).as("bucket"))
      .write.parquet(s"$dir/v1/full")
    // the partial snapshot is invisible: roots and answers are unchanged
    assert(GenLog.versions(spark, dir, requiring = "full") === Seq(0L))
    assert(rows(StreamOps.serveAnnContinuous(spark, dir, probes)) === want)
    // the manifest reports it as present-but-uncommitted
    assert(GenLog.manifest(spark, dir).contains((1L, "full", false)))
    assert(GenLog.manifest(spark, dir).contains((1L, "gen", true)))

    // rerunning the compaction overwrites the partial output, commits,
    // and only then supersedes: answers still unchanged. The superseded
    // generation gets a one-compaction GRACE (tombstoned, excluded from
    // roots, files intact for readers that resolved pre-fold); the next
    // compaction deletes it.
    StreamOps.compactAnnIndex(spark, dir)
    assert(GenLog.versions(spark, dir, requiring = "full").max === 1L)
    assert(
      fsOf(dir).exists(
        new org.apache.hadoop.fs.Path(s"$dir/v1/gen/${GenLog.Superseded}")))
    assert(!GenLog.roots(spark, dir).exists(_.endsWith("v1/gen")))
    assert(rows(StreamOps.serveAnnContinuous(spark, dir, probes)) === want)
    StreamOps.compactAnnIndex(spark, dir)
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(s"$dir/v1/gen")))
    assert(rows(StreamOps.serveAnnContinuous(spark, dir, probes)) === want)
  }

  test("compaction prunes all but the newest keepFulls full snapshots") {
    val dir = Files.createTempDirectory("graft_cat_prune").toString
    val all = T(spark, sf, "embeddings")
    val m = all.agg(max($"vec_id")).head().getLong(0)
    StreamOps.seedAnnIndex(spark, all.filter($"vec_id" <= m / 2), dir)
    def addGen(v: Int, lo: Long, hi: Long): Unit = {
      SimilarityOps.writeAnnIndexFor(
        spark,
        all.filter($"vec_id" > lo && $"vec_id" <= hi),
        s"$dir/v$v/gen")
      GenLog.markCommitted(spark, s"$dir/v$v/gen")
    }
    val probes = SimilarityOps.batchProbeFrame(spark, sf)
    addGen(1, m / 2, m * 3 / 4)
    StreamOps.compactAnnIndex(spark, dir, keepFulls = 1)
    // keepFulls=1: the v0 seed snapshot is pruned after the fold commits
    assert(GenLog.versions(spark, dir, requiring = "full") === Seq(1L))
    addGen(2, m * 3 / 4, m)
    StreamOps.compactAnnIndex(spark, dir, keepFulls = 1)
    assert(GenLog.versions(spark, dir, requiring = "full") === Seq(2L))
    // after two fold+prune cycles the index still answers exactly
    assert(
      rows(StreamOps.serveAnnContinuous(spark, dir, probes)) ===
        rows(SparkEntry.queries("q_sim_batch")(spark, sf)))
    // the directory holds O(keep) corpus copies with one-compaction lag:
    // v1/gen (superseded two compactions ago) is gone, v2/gen rides out
    // its grace tombstoned, and the next compaction collects it too
    assert(GenLog.versions(spark, dir, requiring = "gen") === Seq(2L))
    assert(
      fsOf(dir).exists(
        new org.apache.hadoop.fs.Path(s"$dir/v2/gen/${GenLog.Superseded}")))
    StreamOps.compactAnnIndex(spark, dir, keepFulls = 1)
    assert(GenLog.versions(spark, dir, requiring = "gen").isEmpty)
  }

  test("adopt() migrates a pre-catalog (marker-less) index directory") {
    val dir = Files.createTempDirectory("graft_cat_adopt").toString
    val all = T(spark, sf, "embeddings")
    val cut = all.agg(max($"vec_id")).head().getLong(0) * 8 / 10
    // a legacy layout: real artifacts, written without markers
    graft.ops.SimilarityOps.writeAnnIndexFor(
      spark, all.filter($"vec_id" <= cut), s"$dir/v0/full")
    graft.ops.SimilarityOps.writeAnnIndexFor(
      spark, all.filter($"vec_id" > cut), s"$dir/v1/gen")
    // marker-gated recognition refuses the intact directory...
    intercept[IllegalArgumentException] {
      StreamOps.serveAnnContinuous(
        spark, dir, SimilarityOps.batchProbeFrame(spark, sf))
    }
    // ...until the operator adopts it; then it serves exactly
    val adopted = GenLog.adopt(spark, dir)
    assert(adopted.toSet === Set((0L, "full"), (1L, "gen")))
    assert(
      rows(StreamOps.serveAnnContinuous(
        spark, dir, SimilarityOps.batchProbeFrame(spark, sf))) ===
        rows(SparkEntry.queries("q_sim_batch")(spark, sf)))
    // idempotent: a second adoption finds nothing to do
    assert(GenLog.adopt(spark, dir).isEmpty)
  }

  test("buildOnce: two racing writers build one key exactly once, both serve identical bytes") {
    val dir = s"${Files.createTempDirectory("graft_cat_race")}/idx"
    val builds = new java.util.concurrent.atomic.AtomicInteger
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    // a deliberately slow build widens the race window past the claim
    val threads = (1 to 4).map { _ =>
      new Thread(() =>
        try results.add(GenLog.buildOnce(spark, dir) {
          builds.incrementAndGet()
          Thread.sleep(500)
          SimilarityOps.writeAnnIndexFor(spark, T(spark, sf, "embeddings"), dir)
        })
        catch { case t: Throwable => errors.add(t) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, errors)
    assert(builds.get() === 1, "exactly one racing writer may build")
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toSeq.sorted === Seq(false, false, false, true))
    // the claim is released and every caller (winner and losers alike)
    // serves the one committed artifact set
    assert(!fsOf(dir).exists(GenLog.claimPath(dir)))
    assert(
      rows(SimilarityOps.serveAnnBatch(
        spark, dir, SimilarityOps.batchProbeFrame(spark, sf))) ===
        rows(SparkEntry.queries("q_sim_batch")(spark, sf)))
  }

  test("buildOnce: a killed claimant's key recovers once the claim goes stale") {
    val dir = s"${Files.createTempDirectory("graft_cat_orphan")}/idx"
    val fs = fsOf(dir)
    // simulate a claimant that died mid-build: a claim file, no marker
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    fs.create(GenLog.claimPath(dir), false).close()
    assert(
      new java.io.File(GenLog.claimPath(dir).toUri.getPath)
        .setLastModified(System.currentTimeMillis() - 3600L * 1000L))
    spark.conf.set(GenLog.ClaimTtlKey, "2000")
    try {
      var built = false
      assert(GenLog.buildOnce(spark, dir) { built = true } === true)
      assert(built, "the stale claim must be re-claimed and the build run")
      assert(GenLog.buildOnce(spark, dir) { built = false } === false)
      assert(built, "after recovery the key is committed and skips")
    } finally spark.conf.unset(GenLog.ClaimTtlKey)
  }

  test("buildOnce: a failed build releases the claim instead of wedging the key") {
    val dir = s"${Files.createTempDirectory("graft_cat_fail")}/idx"
    intercept[RuntimeException] {
      GenLog.buildOnce(spark, dir) { throw new RuntimeException("boom") }
    }
    assert(
      !fsOf(dir).exists(GenLog.claimPath(dir)),
      "the failed winner must release its claim")
    var built = false
    assert(GenLog.buildOnce(spark, dir) { built = true } === true && built)
  }

  test("compaction grace: a reader that resolved roots pre-fold finishes its scan") {
    val dir = Files.createTempDirectory("graft_cat_grace").toString
    val all = T(spark, sf, "embeddings")
    val cut = all.agg(max($"vec_id")).head().getLong(0) * 8 / 10
    StreamOps.seedAnnIndex(spark, all.filter($"vec_id" <= cut), dir)
    SimilarityOps.writeAnnIndexFor(
      spark, all.filter($"vec_id" > cut), s"$dir/v1/gen")
    GenLog.markCommitted(spark, s"$dir/v1/gen")
    val probes = SimilarityOps.batchProbeFrame(spark, sf)
    val want = rows(SparkEntry.queries("q_sim_batch")(spark, sf))
    // the live reader: roots resolved and the scan's file listing built
    // BEFORE the compaction commits its fold
    val preCompact =
      SimilarityOps.serveAnnBatchMulti(
        spark, StreamOps.annGenerationRoots(spark, dir), probes)
    StreamOps.compactAnnIndex(spark, dir)
    // without the grace tombstone this collect would race the delete of
    // v1/gen's part files (FileNotFoundException); with it, the reader
    // outlives its snapshot for a full compaction interval
    assert(rows(preCompact) === want)
    // post-grace, the next compaction collects the directory
    StreamOps.compactAnnIndex(spark, dir)
    assert(!fsOf(dir).exists(new org.apache.hadoop.fs.Path(s"$dir/v1/gen")))
    assert(rows(StreamOps.serveAnnContinuous(spark, dir, probes)) === want)
  }

  test("dedup compaction ignores a mid-batch crash's partially-committed version") {
    import org.apache.spark.sql.functions.{col => c}
    val dir = Files.createTempDirectory("graft_cat_halfbatch").toString
    val docs = T(spark, sf, "documents").select($"doc_id", $"lang", $"text")
    val cut = docs.agg(max($"doc_id")).head().getLong(0) * 9 / 10
    StreamOps.seedDedupIndex(spark, docs.filter($"doc_id" <= cut), dir)
    // simulate a batch that crashed after committing its FIRST artifact
    // (assign) but before its index increments
    GenLog.commitParquet(
      docs.filter($"doc_id" > cut).select($"doc_id", $"doc_id".as("cluster_id")),
      s"$dir/v2/assign")
    // compaction must NOT fold a snapshot at v2 (the increments are not
    // committed): gating on the first-written artifact would strand the
    // retried batch's increments at v == snapVer forever
    StreamOps.compactDedupIndex(spark, dir)
    assert(GenLog.versions(spark, dir, requiring = "band_index") === Seq(0L))
    assert(!GenLog.manifest(spark, dir).exists {
      case (2L, "band_index", _) => true
      case _                     => false
    })
  }

  test("dedup/embed snapshot pruners bound the dir to O(keep) copies") {
    val dir = Files.createTempDirectory("graft_cat_embprune").toString
    val vecs = T(spark, sf, "embeddings").select($"vec_id", $"embedding")
    StreamOps.seedEmbedIndex(spark, vecs.filter($"vec_id" <= 100), dir)
    // two more committed snapshots at later versions (stand-ins for two
    // compaction folds)
    for (v <- Seq(3, 5)) {
      GenLog.commitParquet(
        graft.ops.DedupOps.buildEmbedIndex(
          spark, vecs.filter($"vec_id" <= 100 + v)),
        s"$dir/v$v/band_index",
        partitionBy = Seq("band_idx"))
    }
    StreamOps.pruneEmbedIndexVersions(spark, dir, keep = 2)
    assert(
      GenLog.versions(spark, dir, requiring = "band_index").sorted === Seq(3L, 5L))
    // the newest surviving snapshot still reads
    assert(
      StreamOps.readEmbedIndexState(spark, dir, upTo = 5).count() > 0)
  }
}
