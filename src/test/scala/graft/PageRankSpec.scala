package graft

import graft.ops.{DedupOps => D}
import org.apache.spark.sql.functions._

/** Contracts for q_dedup_rank's fixed-point integer PageRank (SURVEY §2):
  * the arithmetic is pure BIGINT, so the spec can compute EXACT expected
  * values with a ten-line driver-side reference and demand equality to the
  * unit — no float tolerance anywhere.
  */
class PageRankSpec extends SparkSpec {

  private val Scale = 1000000000000L

  /** Driver-side reference: same constants, same floor arithmetic. */
  private def reference(
      n: Long,
      pairs: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2))
      .toMap
    val pr0 = Scale / n
    val base = 15L * pr0 / 100L
    var pr = (0L until n).map(v => v -> pr0).toMap
    for (_ <- 1 to iters) {
      pr = (0L until n).map { u =>
        val s = nbrs
          .collect { case (v, ns) if ns.contains(u) => pr(v) / ns.size }
          .sum
        u -> (base + 85L * s / 100L)
      }.toMap
    }
    pr
  }

  private def run(n: Long, pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    D.pageRank(
        (0L until n).toDF("doc_id"),
        pairs.toDF("a_id", "b_id"))
      .as[(Long, Long)]
      .collect()
      .toMap
  }

  test("planted star: the hub out-ranks its leaves, unit-exact vs the " +
    "driver reference") {
    // 0-1, 0-2, 0-3 (hub 0), 4..9 isolated
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L))
    val got = run(10, pairs)
    val want = reference(10, pairs, 3)
    assert(got == want, s"got $got\nwant $want")
    assert(got(0L) > got(1L), "hub must out-rank a leaf")
    assert(got(1L) == got(2L) && got(2L) == got(3L), "leaves are symmetric")
    // isolated nodes hold exactly the teleport mass
    val base = 15L * (Scale / 10) / 100L
    (4L to 9L).foreach(v => assert(got(v) == base, s"isolated $v: ${got(v)}"))
  }

  test("planted two-clique vs chain: clique members out-rank chain ends") {
    // clique {0,1,2} (all pairs) vs chain 3-4-5
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L), (4L, 5L))
    val got = run(6, pairs)
    assert(got == reference(6, pairs, 3))
    assert(got(4L) > got(3L), "chain middle out-ranks its end")
    assert(got(0L) > got(3L), "clique member out-ranks a chain end")
  }

  test("partition-order-free and mass is bounded by the invariant") {
    import spark.implicits._
    val pairs = (0L until 40L).map(i => (i, (i * 7 + 1) % 41)).filter(p => p._1 != p._2)
    val a = run(41, pairs)
    val b = D.pageRank(
        (0L until 41L).toDF("doc_id").repartition(7),
        pairs.toDF("a_id", "b_id").repartition(5))
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(a == b, "result depends on partitioning")
    // floor division only leaks mass: total never exceeds SCALE, never
    // drops below the teleport floor
    val total = a.values.sum
    val base = 15L * (Scale / 41) / 100L
    assert(total <= Scale && total >= base * 41, s"total $total")
  }

  test("q_dedup_rank_rep: the representative is the best-connected member " +
    "— clusters agree with q_dedup_cc, rep = argmax pr with doc_id " +
    "tie-break, singletons represent themselves") {
    import spark.implicits._
    val rep = SparkEntry.queries("q_dedup_rank_rep")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cc = SparkEntry.queries("q_dedup_cc")(spark, sf)
      .select($"doc_id", $"cluster_id")
      .as[(Long, Long)].collect()
    val pr = SparkEntry.queries("q_dedup_rank")(spark, sf)
      .as[(Long, Long)].collect().toMap
    val byCluster = cc.groupBy(_._2)
    assert(rep.map(_._1).toSet == byCluster.keySet, "cluster sets differ")
    rep.foreach { case (cid, size, repId, repPr) =>
      val members = byCluster(cid).map(_._1)
      assert(size == members.length, s"cluster $cid size")
      val want = members.map(m => (pr(m), -m)).max
      assert((repPr, -repId) == want, s"cluster $cid rep: got ($repId, $repPr)")
    }
    // singletons are their own representative
    rep.filter(_._2 == 1L).foreach { case (cid, _, repId, _) =>
      assert(cid == repId, s"singleton $cid rep $repId")
    }
  }

  test("fused rank+label kernel: pr identical to pageRank; labels + the " +
    "contraction finish reach the closure fixpoint even on long chains") {
    import spark.implicits._
    // a 30-node chain (ids descending so min-propagation needs the full
    // depth — 3 fused hops CANNOT converge it), plus a clique and
    // isolated nodes
    val chain = (0 until 29).map(i => (29L - i, 29L - i - 1L))
    val clique = Seq((30L, 31L), (30L, 32L), (31L, 32L))
    val pairs = chain ++ clique
    val docs = (0L until 35L).toDF("doc_id")
    val pairsDf = pairs.toDF("a_id", "b_id")
    val fused = D.pageRankWithLabels(docs, pairsDf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // pr leg: value-identical to the standalone kernel
    val pr = D.pageRank(docs, pairsDf).as[(Long, Long)].collect().toMap
    assert(fused.view.mapValues(_._1).toMap == pr, "fused pr differs from pageRank")
    // labels after 3 hops are NOT the fixpoint on the chain (that's the
    // point of the finish) — the contraction + ccAssign must close it
    assert(fused(29L)._2 > 0L, "3 min-hops should not have converged the chain")
    val st = fused.toSeq.map { case (id, (_, lab)) => (id, lab) }.toDF("doc_id", "label")
    val contracted = pairsDf
      .join(st.select($"doc_id".as("aid"), $"label".as("la")), $"a_id" === $"aid")
      .join(st.select($"doc_id".as("bid"), $"label".as("lb")), $"b_id" === $"bid")
      .filter($"la" =!= $"lb")
      .select($"la".as("a_id"), $"lb".as("b_id"))
      .distinct()
    val cc = D.ccAssign(spark, contracted, st.select($"doc_id", $"label".as("rep")))
      .as[(Long, Long)].collect().toMap
    (0L to 29L).foreach(v => assert(cc(v) == 0L, s"chain node $v: ${cc(v)}"))
    (30L to 32L).foreach(v => assert(cc(v) == 30L, s"clique node $v: ${cc(v)}"))
    (33L to 34L).foreach(v => assert(cc(v) == v, s"isolated $v: ${cc(v)}"))
  }

  test("repeated dumps are byte-identical: two Verify-style parquet dumps " +
    "of q_dedup_rank carry the same bytes") {
    // The driver hash-compares a parquet dump; this pins the whole chain
    // (values, row order after ORDER BY doc_id, encoding) as run-to-run
    // deterministic, so any driver-side hash mismatch has to come from
    // the oracle side, not the engine dump.
    def dump(dir: String): Array[Byte] = {
      SparkEntry
        .queries("q_dedup_rank")(spark, sf)
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(dir)
      val part = new java.io.File(dir)
        .listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(part.length == 1, s"expected one part file, got ${part.length}")
      java.nio.file.Files.readAllBytes(part.head.toPath)
    }
    val tmp = java.nio.file.Files.createTempDirectory("prdump").toString
    val a = dump(s"$tmp/a")
    val b = dump(s"$tmp/b")
    assert(java.util.Arrays.equals(a, b), "two dumps differ byte-wise")
  }

  test("q_dedup_rank plan: the edge lineage is checkpointed once and each " +
    "iteration joins the slim pr frame — no re-derivation of the minhash " +
    "pipeline per round") {
    val p = SparkEntry
      .queries("q_dedup_rank")(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    // the final plan hangs off the LAST iteration's localCheckpoint scan:
    // no minhash/band operators survive into the per-round lineage
    assert(p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("posexplode"), p)
  }
}
