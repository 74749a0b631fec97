package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import scala.sys.process._

/** The durable-warehouse deployment story of the index catalog, proven
  * across a REAL session boundary: a `build` JVM points
  * `spark.graft.index.root` at a fixed directory and builds the served
  * indexes; a FRESH `serve` JVM (new process, new SparkSession, zero
  * shared driver state) answers the same queries from the committed
  * artifacts alone — builds_run must be 0 — and exercises `adopt()` on
  * a marker-less legacy directory under the same root. Each phase runs
  * [[graft.tools.CrossSession]] in its own forked JVM with this test
  * JVM's classpath.
  */
// Tagged slow (r19, verdict item 1): crash/durability soak; excluded from the
// default `sbt test` so the suite fits the driver budget — run via
// `sbt -Dgraft.slow.tests=true test` (see build.sbt).
@org.scalatest.tags.Slow
class DurableRootSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def runPhase(phase: String, root: String, out: String): String = {
    val cmd = Seq(
      s"${System.getProperty("java.home")}/bin/java") ++ addOpens ++ Seq(
      "-Xmx4g",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.CrossSession", phase, root, sf, out)
    val buf = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(l => buf.append(l).append('\n'), _ => ()))
    assert(code === 0, s"phase $phase exited $code:\n${buf.toString.takeRight(2000)}")
    val line = buf.toString.linesIterator.find(_.startsWith("[cross]"))
    assert(line.nonEmpty, s"phase $phase printed no [cross] line")
    line.get
  }

  test("a fresh session serves a durable root's committed artifacts without rebuilding") {
    val root = Files.createTempDirectory("graft_durable_root").toString
    val out = Files.createTempDirectory("graft_durable_out").toString

    val built = runPhase("build", root, out)
    // the first session really built (both served indexes + the embedding
    // probe frame's store are fresh)
    assert("builds=(\\d+)".r.findFirstMatchIn(built).get.group(1).toLong >= 2, built)

    val served = runPhase("serve", root, out)
    // CROSS-SESSION AMORTIZATION: the new JVM built nothing — every byte
    // it answered from was committed by the previous session
    assert(served.contains("builds=0"), served)
    assert("skips=(\\d+)".r.findFirstMatchIn(served).get.group(1).toLong >= 2, served)

    // and byte-for-byte the same answers across the session boundary,
    // both equal to this (third) session's oracle-checked result
    val sortKeys = Map(
      "q_sim_served" -> Seq($"probe_id", $"cos".desc, $"vec_id"),
      "q_index_bm25_served" -> Seq($"query_id".asc, $"rank".asc))
    for ((q, keys) <- sortKeys) {
      val b = rows(spark.read.parquet(s"$out/build_$q").orderBy(keys: _*))
      val v = rows(spark.read.parquet(s"$out/serve_$q").orderBy(keys: _*))
      assert(b === v, s"$q diverged across the session boundary")
    }
    assert(
      rows(spark.read.parquet(s"$out/serve_q_sim_served")
        .orderBy($"probe_id", $"cos".desc, $"vec_id")) ===
        rows(SparkEntry.queries("q_sim_batch")(spark, sf)),
      "cross-session serve diverged from the monolithic oracle answer")

    // the adopted legacy index on the same root serves the full corpus
    assert(
      rows(spark.read.parquet(s"$out/serve_legacy")
        .orderBy($"probe_id", $"cos".desc, $"vec_id")) ===
        rows(SparkEntry.queries("q_sim_batch")(spark, sf)),
      "adopt() on the durable root did not serve exactly")
  }

  test("two PROCESSES racing one buildOnce key: exactly one builds, both serve") {
    val root = Files.createTempDirectory("graft_claim_race").toString
    val out = Files.createTempDirectory("graft_claim_out").toString
    // launch both JVMs concurrently; each runs buildOnce on the same key
    // with a deliberately slow build, so the loser's attempt lands while
    // the winner's claim is live (the claim is a filesystem primitive —
    // the in-JVM thread race in IndexCatalogSpec can't cover this)
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val procs = (1 to 2).map { _ =>
      val cmd = Seq(
        s"${System.getProperty("java.home")}/bin/java") ++ addOpens ++ Seq(
        "-Xmx3g",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.CrossSession", "claim", root, sf, out)
      Process(cmd).run(ProcessLogger(l => if (l.startsWith("[cross]")) lines.add(l), _ => ()))
    }
    val codes = procs.map(_.exitValue())
    assert(codes === Seq(0, 0), s"claim racers exited $codes: $lines")
    import scala.jdk.CollectionConverters._
    val built = lines.asScala.toSeq.map { l =>
      "built=(\\d)".r.findFirstMatchIn(l).get.group(1).toInt
    }
    assert(built.sum === 1, s"exactly one process may build: $lines")
    assert(
      lines.asScala.forall(_.contains("served=500")),
      s"both processes must serve the committed artifact: $lines")
  }

  test("a kill -9'd claimant's key recovers: the TTL reclaims a REAL crash orphan") {
    val root = Files.createTempDirectory("graft_kill_claim").toString
    val key = s"$root/racekey"
    // a claimant JVM that takes the lease and hangs mid-build forever
    val claimed = new java.util.concurrent.CountDownLatch(1)
    val cmd = Seq(
      s"${System.getProperty("java.home")}/bin/java") ++ addOpens ++ Seq(
      "-Xmx2g",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.CrossSession", "stall", root, sf, root)
    val proc = Process(cmd).run(
      ProcessLogger(l => if (l.contains("claimed=1")) claimed.countDown(), _ => ()))
    assert(claimed.await(120, java.util.concurrent.TimeUnit.SECONDS),
      "stalling claimant never took the lease")
    assert(
      new java.io.File(graft.index.GenLog.claimPath(key).toUri.getPath).exists,
      "claim file must be on disk while the claimant hangs")
    proc.destroy() // SIGKILL mid-build: claim on disk, no marker, owner dead
    assert(proc.exitValue() !== 0)

    // recovery in THIS session: the claim is a crash orphan once its age
    // passes the TTL; buildOnce waits it out, reclaims, builds
    spark.conf.set(graft.index.GenLog.ClaimTtlKey, "3000")
    try {
      var built = false
      assert(graft.index.GenLog.buildOnce(spark, key) {
        built = true
        T(spark, sf, "embeddings").limit(10).write
          .mode("overwrite").parquet(key)
      } === true)
      assert(built, "the orphaned key must recover and rebuild")
      assert(spark.read.parquet(key).count() === 10)
      assert(graft.index.GenLog.buildOnce(spark, key) { fail("must skip") } === false)
    } finally spark.conf.unset(graft.index.GenLog.ClaimTtlKey)
  }
}
