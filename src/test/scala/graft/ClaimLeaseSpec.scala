package graft

import java.nio.file.Files

import graft.index.GenLog
import org.apache.hadoop.fs.Path

/** The round-12 hardening of the buildOnce claim lease:
  *
  *  - HEARTBEAT: the winner touches its claim every TTL/4, so a build
  *    that legitimately outlives the TTL is never treated as a crash
  *    orphan — a concurrent caller waits instead of re-claiming, and
  *    exactly one build runs (the TTL now sizes only crash-detection
  *    latency, decoupled from build duration);
  *  - POST-CLAIM RE-CHECK: a caller that wins the lease in the gap
  *    after a previous winner's commit-and-release skips instead of
  *    re-running the build (whose Overwrite would transiently delete
  *    the committed artifact under live readers);
  *  - RENAME RECLAIM: stale-claim reclaim goes through a rename to a
  *    unique name, so of any number of racing reclaimers exactly one
  *    proceeds — a slow reclaimer can never delete a fast re-claimer's
  *    fresh claim (the unconditional-delete TOCTOU);
  *  - SCHEME GATE: buildOnce refuses filesystem schemes not known to
  *    provide atomic create-if-absent (object stores without a
  *    conditional put would silently lose the mutual exclusion), with
  *    a conf opt-in for stores that do.
  *
  * And the round-13 observability/immunity layer on top:
  *
  *  - DOUBLE-BUILD DETECTOR: every buildOnce winner carries a UUID
  *    (written into its claim and its commit marker); a winner whose
  *    commit finds a marker ALREADY present — the footprint of the
  *    residual lease race, which mtime leases cannot close without
  *    filesystem CAS — fails loudly with both identities instead of
  *    silently stacking its marker over a possibly-torn artifact;
  *  - RLOCK SWEEP: a crash-orphaned reclaim lock is removed through
  *    rename-then-re-stat, never stat-then-delete, so a holder of a
  *    stale observation can no longer destroy the FRESH lock a new
  *    reclaimer created after the orphan's release.
  */
class ClaimLeaseSpec extends SparkSpec {

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("heartbeat: a build slower than the TTL completes unmolested while a concurrent caller waits") {
    val dir = s"${Files.createTempDirectory("graft_lease_hb")}/idx"
    // TTL chosen above mtime-rounding granularity (some filesystems round
    // setTimes to whole seconds) PLUS full-suite scheduling jitter (a
    // loaded JVM can delay the heartbeat thread by a GC pause), and well
    // below the build's ~7s runtime so the losers genuinely outwait it
    spark.conf.set(GenLog.ClaimTtlKey, "4000")
    try {
      val builds = new java.util.concurrent.atomic.AtomicInteger
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val mtimes = new java.util.concurrent.ConcurrentLinkedQueue[Long]
      val claimLive = new java.util.concurrent.CountDownLatch(1)
      val winner = new Thread(() =>
        try results.add(GenLog.buildOnce(spark, dir) {
          builds.incrementAndGet()
          claimLive.countDown()
          // sample the claim's mtime across the slow build: the
          // heartbeat must advance it, or the losers' staleness check
          // is one missed sample from a double build
          val claim = GenLog.claimPath(dir)
          (1 to 12).foreach { _ =>
            Thread.sleep(600)
            mtimes.add(fsOf(dir).getFileStatus(claim).getModificationTime)
          }
          spark.range(10).write.mode("overwrite").parquet(dir)
        }) catch { case t: Throwable => errors.add(t) })
      winner.start()
      assert(claimLive.await(60, java.util.concurrent.TimeUnit.SECONDS))
      // concurrent callers arrive while the slow build holds the lease
      // well past the TTL; without the heartbeat they would reclaim and
      // run a second Overwrite build mid-flight
      val losers = (1 to 2).map(_ => new Thread(() =>
        try results.add(GenLog.buildOnce(spark, dir) {
          builds.incrementAndGet()
          spark.range(10).write.mode("overwrite").parquet(dir)
        }) catch { case t: Throwable => errors.add(t) }))
      losers.foreach(_.start())
      (winner +: losers).foreach(_.join(120000))
      assert(errors.isEmpty, s"lease race threw: ${errors.peek()}")
      assert(builds.get() === 1, "the slow winner must be the ONLY build")
      import scala.jdk.CollectionConverters._
      assert(results.asScala.toSeq.sorted === Seq(false, false, true))
      // the liveness signal itself: the claim's mtime advanced mid-build
      val ts = mtimes.asScala.toSeq
      assert(ts.max > ts.min, "heartbeat never touched the claim mtime")
      assert(!fsOf(dir).exists(GenLog.claimPath(dir)), "claim must be released")
      assert(spark.read.parquet(dir).count() === 10)
    } finally spark.conf.unset(GenLog.ClaimTtlKey)
  }

  test("post-claim re-check: winning the lease after another winner's commit+release skips, not rebuilds") {
    val dir = s"${Files.createTempDirectory("graft_lease_recheck")}/idx"
    // seam fires between tryClaim success and the re-check — the instant
    // at which, in the real race, the competing winner's commit+release
    // has already landed (that release is why tryClaim succeeded)
    GenLog.onClaimWon = () => {
      spark.range(7).write.mode("overwrite").parquet(dir)
      GenLog.markCommitted(spark, dir)
    }
    try {
      val (runs0, skips0) = (GenLog.buildsRun.get(), GenLog.buildsSkipped.get())
      var built = false
      assert(GenLog.buildOnce(spark, dir) { built = true } === false)
      assert(!built, "the re-check must prevent the redundant rebuild")
      assert(GenLog.buildsRun.get() === runs0)
      assert(GenLog.buildsSkipped.get() === skips0 + 1)
      // the claim was released on the skip path too — the key is clean
      assert(!fsOf(dir).exists(GenLog.claimPath(dir)))
      assert(spark.read.parquet(dir).count() === 7,
        "the previously committed artifact must survive untouched")
    } finally GenLog.onClaimWon = () => ()
  }

  test("rename reclaim: racing reclaimers of one stale claim admit exactly one new build") {
    val dir = s"${Files.createTempDirectory("graft_lease_reclaim")}/idx"
    val fs = fsOf(dir)
    fs.mkdirs(new Path(dir))
    fs.create(GenLog.claimPath(dir), false).close()
    assert(new java.io.File(GenLog.claimPath(dir).toUri.getPath)
      .setLastModified(System.currentTimeMillis() - 3600L * 1000L))
    // the hour-old mtime makes the orphan stale IMMEDIATELY at any TTL;
    // the TTL itself needs full-suite headroom (a GC pause delaying the
    // new winner's heartbeat past a tight TTL would let a second
    // reclaimer steal the rebuilt key — observed flaking at 1000ms
    // under a loaded 32-thread suite JVM)
    spark.conf.set(GenLog.ClaimTtlKey, "4000")
    try {
      val builds = new java.util.concurrent.atomic.AtomicInteger
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]
      // four concurrent callers all observe the SAME stale claim; the
      // rename funnel must admit exactly one to the rebuild
      val threads = (1 to 4).map(_ => new Thread(() =>
        try results.add(GenLog.buildOnce(spark, dir) {
          builds.incrementAndGet()
          Thread.sleep(300) // hold the lease so slower reclaimers arrive mid-build
          spark.range(5).write.mode("overwrite").parquet(dir)
        }) catch { case t: Throwable => errors.add(t) }))
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(errors.isEmpty, s"reclaim race threw: ${errors.peek()}")
      assert(builds.get() === 1, "exactly one reclaimer may rebuild the orphaned key")
      import scala.jdk.CollectionConverters._
      assert(results.asScala.toSeq.sorted === Seq(false, false, false, true))
      assert(spark.read.parquet(dir).count() === 5)
      // no reclaim debris: neither the claim nor any renamed tombstone
      val leftovers = fs.listStatus(new Path(dir).getParent)
        .map(_.getPath.getName).filter(_.contains("_GRAFT_CLAIM"))
      assert(leftovers.isEmpty, s"reclaim left debris: ${leftovers.toSeq}")
    } finally spark.conf.unset(GenLog.ClaimTtlKey)
  }

  test("double-build detector: a foreign marker landing mid-build fails the commit loudly") {
    val dir = s"${Files.createTempDirectory("graft_lease_double")}/idx"
    val fs = fsOf(dir)
    // The build thunk ITSELF plays the concurrent winner: it commits a
    // foreign-UUID marker while "this" winner is still building — the
    // exact interleave of the residual race (an alive-but-silent owner
    // and a reclaimed second winner both past the post-claim re-check).
    val e = intercept[GenLog.DoubleBuildDetected] {
      GenLog.buildOnce(spark, dir) {
        spark.range(4).write.mode("overwrite").parquet(dir)
        GenLog.markCommitted(spark, dir, "foreign-winner-uuid")
      }
    }
    assert(e.getMessage.contains(dir))
    assert(e.getMessage.contains("foreign-winner-uuid"),
      "the alarm must attribute the concurrent committer")
    // the foreign commit is preserved — the detector refuses to stack
    // its own marker over it — and the claim is still released
    assert(GenLog.committedBuildId(fs, dir) === Some("foreign-winner-uuid"))
    assert(!fs.exists(GenLog.claimPath(dir)), "claim must be released on the alarm path")
    // a clean key round-trips its winner UUID through the marker
    val dir2 = s"${Files.createTempDirectory("graft_lease_double")}/idx2"
    assert(GenLog.buildOnce(spark, dir2) {
      spark.range(4).write.mode("overwrite").parquet(dir2)
    } === true)
    val id = GenLog.committedBuildId(fsOf(dir2), dir2)
    assert(id.exists(_.length === 36), s"buildOnce marker must carry the winner UUID, got $id")
  }

  test("rlock sweep: rename-then-re-stat removes orphans but restores a displaced fresh lock") {
    val base = Files.createTempDirectory("graft_lease_sweep").toString
    val fs = fsOf(base)
    def mk(name: String, ageMs: Long): Path = {
      val p = new Path(base, name)
      fs.create(p, false).close()
      assert(new java.io.File(p.toUri.getPath)
        .setLastModified(System.currentTimeMillis() - ageMs))
      p
    }
    def debris(): Seq[String] =
      fs.listStatus(new Path(base)).map(_.getPath.getName)
        .filter(_.contains(".swept.")).toSeq
    // a genuine crash orphan (hour-old) is swept
    val orphan = mk("a.reclaim_lock", 3600L * 1000L)
    GenLog.sweepStaleRlock(fs, orphan, 30000L)
    assert(!fs.exists(orphan), "an hour-old reclaim lock must be swept")
    // a fresh lock is left alone (first stat already says live)
    val fresh = mk("b.reclaim_lock", 0L)
    GenLog.sweepStaleRlock(fs, fresh, 30000L)
    assert(fs.exists(fresh), "a live reclaim lock must never be touched")
    // THE advised race: the observation is stale, but between it and the
    // removal the orphan's holder releases and a NEW reclaimer acquires —
    // a bare stat-then-delete would destroy the new holder's lock; the
    // rename-then-re-stat discipline restores it instead
    val raced = mk("c.reclaim_lock", 3600L * 1000L)
    GenLog.sweepStaleRlock(fs, raced, 30000L, afterStat = () => {
      fs.delete(raced, false) // the stalled holder finally releases
      fs.create(raced, false).close() // a new reclaimer wins the path NOW
    })
    assert(fs.exists(raced),
      "a fresh lock that won the path after the stale observation must be restored")
    assert(System.currentTimeMillis() -
      fs.getFileStatus(raced).getModificationTime < 30000L,
      "the restored lock must be the NEW holder's (fresh mtime), not the orphan")
    assert(debris() === Seq.empty, s"sweep left tombstone debris")
  }

  test("scheme gate: unknown schemes are refused with an actionable message, conf opts in") {
    // unit surface: the allowlist and the conf escape hatch
    GenLog.requireClaimScheme("file", Set.empty)
    GenLog.requireClaimScheme("hdfs", Set.empty)
    val e = intercept[IllegalArgumentException] {
      GenLog.requireClaimScheme("s3a", Set.empty)
    }
    assert(e.getMessage.contains("s3a"))
    assert(e.getMessage.contains(GenLog.ClaimSchemesKey),
      "the refusal must name the conf key that opts a scheme in")
    GenLog.requireClaimScheme("s3a", Set("s3a")) // opted in: no throw

    // integration surface: a registered fake object-store scheme is
    // refused by buildOnce BEFORE any filesystem mutation...
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.fakestore.impl", classOf[FakeStoreFs].getName)
    val dir = s"fakestore://${Files.createTempDirectory("graft_lease_scheme")}/idx"
    var built = false
    val e2 = intercept[IllegalArgumentException] {
      GenLog.buildOnce(spark, dir) { built = true }
    }
    assert(!built && e2.getMessage.contains("fakestore"))
    // ...and served normally once the deployment declares the store safe
    spark.conf.set(GenLog.ClaimSchemesKey, " fakestore , s3a ")
    try {
      assert(GenLog.buildOnce(spark, dir) {
        spark.range(3).write.mode("overwrite")
          .parquet(new Path(dir).toUri.getPath)
      } === true)
      assert(GenLog.buildOnce(spark, dir) { fail("must skip") } === false)
    } finally spark.conf.unset(GenLog.ClaimSchemesKey)
  }
}

/** A local filesystem masquerading as an object store: same bytes, a
  * scheme the claim-lease allowlist has never heard of.
  */
class FakeStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("fakestore:///")
  override def getScheme: String = "fakestore"
}
