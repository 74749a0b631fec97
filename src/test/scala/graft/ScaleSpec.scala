package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale stress for the heavy family (verdict-r7 #2): the 100 TB design
  * claims, exercised empirically at 10× sf0.1 volume inside the CI heap.
  *
  * Construction: replica k of the sf0.1 corpus tags every token with the
  * replica id (documents) / appends a two-char suffix (customer names),
  * so replicas are mutually invisible to every similarity key — exact
  * md5, MinHash bands, deletion variants (cross-replica edit distance is
  * ≥ 2 by the two-char suffix). The 10× corpus is therefore ten
  * independent copies of the 1× dup structure, which makes two things
  * assertable that a naive replication breaks:
  *
  *  - correctness at scale: cluster count at 10× = 10 × (count at 1×)
  *    + 1 (the planted hot cluster) within a 2% corridor — the corridor
  *    absorbs only banded-LSH recall noise (tagging re-rolls every token
  *    hash, and candidate recall at J barely ≥ 0.9 is probabilistic in
  *    the hashes), not structural change;
  *  - runtime growth ≈ linear: the banded/bucketed shapes do 10× the
  *    work on 10× the data (an all-pairs regression would do 100×).
  *
  * Planted skew: 500 near-identical documents (31 tokens, 30 shared)
  * collapse into ONE hot band bucket — ~125k candidate pairs through a
  * single key, the adversarial shape AQE skew-splitting plus the slim
  * pair representation must absorb.
  */
// Tagged slow (r19, verdict item 1): 10x scale-linearity audit (the driver runs its own 10x gate); excluded from the
// default `sbt test` so the suite fits the driver budget — run via
// `sbt -Dgraft.slow.tests=true test` (see build.sbt).
@org.scalatest.tags.Slow
class ScaleSpec extends SparkSpec {

  private val Sf01 = "/root/testdata/sf0.1"
  private val Replicas = 10
  private val HotDocs = 500
  private val HotBaseId = 10000000L

  private def tagDocs(k: Int): DataFrame = {
    import spark.implicits._
    val tag = ('a' + k).toChar.toString
    T(spark, Sf01, "documents")
      .select(
        ($"doc_id" + lit(k * 5000L)).as("doc_id"),
        concat_ws(" ",
          expr(s"transform(split(coalesce(text, ''), ' '), t -> concat(t, 'z$tag'))"))
          .as("text"),
        $"lang",
        $"source")
      .withColumn("n_chars", length($"text"))
  }

  private def hotDocs(): DataFrame = {
    import spark.implicits._
    val base = (0 until 30).map(i => f"hot$i%02dhh").mkString(" ")
    spark.range(HotDocs)
      .select(
        ($"id" + HotBaseId).as("doc_id"),
        concat(lit(base + " uniq"), $"id", lit("hh")).as("text"),
        lit("en").as("lang"),
        lit("synthetic").as("source"))
      .withColumn("n_chars", length($"text"))
  }

  private def tagCustomers(k: Int): DataFrame = {
    import spark.implicits._
    val tag = ('a' + k).toChar.toString * 2
    T(spark, Sf01, "customer")
      .select(
        ($"c_custkey" + lit(k * 1000000L)).as("c_custkey"),
        concat($"c_name", lit(s"_$tag")).as("c_name"),
        $"c_nationkey",
        $"c_acctbal",
        $"c_mktsegment")
  }

  /** (1× dir, 10× dir): scaled corpora staged as testdata-shaped parquet
    * directories so the registered queries run on them unmodified.
    */
  private lazy val dirs: (String, String) = {
    val d1 = Files.createTempDirectory("graft_scale_1x").toString
    val d10 = Files.createTempDirectory("graft_scale_10x").toString
    tagDocs(0).write.mode("overwrite").parquet(s"$d1/documents.parquet")
    tagCustomers(0).write.mode("overwrite").parquet(s"$d1/customer.parquet")
    (0 until Replicas)
      .map(tagDocs)
      .reduce(_ unionByName _)
      .unionByName(hotDocs())
      .write.mode("overwrite").parquet(s"$d10/documents.parquet")
    (0 until Replicas)
      .map(tagCustomers)
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$d10/customer.parquet")
    (d1, d10)
  }

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Warm once at 1× (codegen/JIT), then time 1× and 10×. Linear growth
    * means ratio ≈ 10; `maxRatio` is set per query to ~2× the observed
    * ratio — tight enough to catch a regression well below quadratic
    * (ratio ≈ 100), loose enough to pass host noise. Small denominators
    * are floored at 1 s so a fast 1× run cannot manufacture a flaky
    * ratio.
    */
  private def assertLinear(name: String, maxRatio: Double): Unit = {
    val (d1, d10) = dirs
    val q = SparkEntry.queries(name)
    q(spark, d1).foreach(_ => ()) // warmup
    val t1 = timed(q(spark, d1).foreach(_ => ()))
    val t10 = timed(q(spark, d10).foreach(_ => ()))
    val ratio = t10 / math.max(t1, 1.0)
    info(f"$name: 1x=$t1%.1fs 10x=$t10%.1fs ratio=$ratio%.1f")
    assert(ratio <= maxRatio,
      f"$name grew superlinearly (ratio $ratio%.1f > $maxRatio%.1f): 1x=$t1%.1fs 10x=$t10%.1fs")
  }

  test("q_dedup_cc at 10x: per-replica structure, hot cluster closes, linear") {
    import spark.implicits._
    val (d1, d10) = dirs
    val c1 = SparkEntry.queries("q_dedup_cc")(spark, d1)
      .agg(countDistinct($"cluster_id")).head().getLong(0)
    val out10 = SparkEntry.queries("q_dedup_cc")(spark, d10)
    val c10 = out10.agg(countDistinct($"cluster_id")).head().getLong(0)
    // per-replica structure is NEAR-identical, not exact: the replica tag
    // changes every token hash, and banded-LSH recall at J barely >= 0.9
    // is probabilistic in the hashes (~88%), so borderline pairs differ
    // per replica — a 2% corridor passes that noise and still fails any
    // structural change (collapsed or exploded clustering)
    val want = Replicas * c1 + 1
    assert(math.abs(c10 - want) <= want / 50,
      s"expected ~$want clusters at 10x (2% corridor), got $c10 (1x has $c1)")
    // the planted hot bucket: the 500 near-dups close into one dominant
    // cluster rooted at the min id. A few singletons are EXPECTED MinHash
    // behavior, not a bug: a doc whose unique token wins a lane minimum
    // in both bands has no canonical band signature — P(no canonical
    // band) = (1-(1-1/31)^4)^2 ≈ 1.5%, so ~7 of 500 escape banding
    // (observed 6 with these hashes). The skew stress — one band bucket
    // holding ~125k candidate pairs — happens regardless.
    val hot = out10.filter($"doc_id" >= HotBaseId)
      .select($"cluster_id", $"cluster_size").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hot.values.sum === HotDocs.toLong, hot.toString)
    assert(hot(HotBaseId) >= HotDocs - 15, s"dominant hot cluster too small: $hot")
    assertLinear("q_dedup_cc", maxRatio = 6.0) // observed 2.9
  }

  test("q_dedup_passage_cc and q_lm_* at 10x: per-replica structure, linear") {
    import spark.implicits._
    val (d1, d10) = dirs
    // passage clusters are EXACT (md5 window equality — no LSH recall
    // noise), so replica structure is exact: token tagging preserves
    // within-replica 50-token matches and breaks every cross-replica
    // one, and the 31-token hot docs are below the window length, so
    // 10x carries exactly 10x the 1x non-singleton clusters
    def nontrivial(d: String): Long =
      SparkEntry.queries("q_dedup_passage_cc")(spark, d)
        .filter($"cluster_size" >= 2)
        .agg(countDistinct($"cluster_id")).head().getLong(0)
    val c1 = nontrivial(d1)
    assert(c1 > 0, "the sf0.1 corpus must carry real 50-token duplicate passages")
    assert(nontrivial(d10) === Replicas * c1)
    // LM vocabulary is replica-namespaced: exactly 10x the 1x terms plus
    // the hot-doc vocabulary (30 shared chrome tokens + 1 unique per doc)
    def vocab(d: String): Long = SparkEntry.queries("q_lm_unigram")(spark, d).count()
    assert(vocab(d10) === Replicas * vocab(d1) + 30L + HotDocs)
    assertLinear("q_dedup_passage_cc", maxRatio = 8.0) // observed 4.1
    assertLinear("q_lm_score", maxRatio = 10.0) // observed 5.2
    // the smoothed models (r15): pair-type state is replica-namespaced
    // like the vocabulary, so the model joins must stay linear too
    assertLinear("q_lm_interp", maxRatio = 8.0) // observed 4.0
    assertLinear("q_lm_kn", maxRatio = 11.0) // observed 5.6
    // DSIR selection weights: one model join + a per-row threshold
    assertLinear("q_sample_importance", maxRatio = 9.0) // observed 4.4
  }

  test("q_dedup_rank at 10x: replica mass uniform, hot cluster " +
    "concentrates mass, isolated floor exact, linear") {
    import spark.implicits._
    val (_, d10) = dirs
    val out = SparkEntry.queries("q_dedup_rank")(spark, d10)
      .localCheckpoint()
    val n = out.count()
    val base = 15L * (1000000000000L / n) / 100L
    // replicas carry the same dup structure up to banded-LSH recall
    // noise (the q_dedup_cc corridor), so per-replica total mass must be
    // uniform: any replica skew means the graph leaked across replicas
    val masses = out
      .filter($"doc_id" < HotBaseId)
      .groupBy(floor($"doc_id" / lit(5000L)).as("rep"))
      .agg(sum($"pr").as("mass"))
      .select($"mass")
      .as[Long]
      .collect()
    assert(masses.length == Replicas)
    assert(
      masses.max <= masses.min + masses.min / 50,
      s"replica mass skew: ${masses.sorted.toSeq}")
    // the planted 500-near-dup clique circulates its mass: members hold
    // ~pr0 ≈ 6.7x the teleport floor, while a leaf/isolated doc decays
    // to base — the centrality signal the operator exists to surface
    val hotMean =
      out.filter($"doc_id" >= HotBaseId).agg(avg($"pr")).head().getDouble(0)
    assert(hotMean >= 3.0 * base, s"hot mean $hotMean vs base $base")
    // isolated docs hold EXACTLY the teleport mass (integer arithmetic:
    // no tolerance)
    assert(out.agg(min($"pr")).head().getLong(0) == base)
    assertLinear("q_dedup_rank", maxRatio = 8.0) // observed 4.1
    // canonicalization shares the rank's checkpointed pair lineage; the
    // closure + argmax cut on top must not change the growth class
    assertLinear("q_dedup_rank_rep", maxRatio = 6.0) // observed 2.8
  }

  test("banded pair join at 10x keeps its plan shape: equi-join, no cartesian") {
    import graft.ops.DedupOps
    val (_, d10) = dirs
    val pairs = DedupOps.bandedJaccardPairs(
      spark, DedupOps.hashedToksOf(T(spark, d10, "documents")), 9, 10,
      ordered = false)
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("ShuffledHashJoin"), p)
  }

  test("q_pipeline_corpus2 at 10x: per-replica accounting is 10x the 1x cells, linear") {
    import spark.implicits._
    val (d1, d10) = dirs
    // tags change no gate signal (length, diversity, bigram stats all
    // shift equally), so each replica's kept accounting equals the 1x
    // run's; the hot cluster adds exactly one kept representative
    val a1 = SparkEntry.queries("q_pipeline_corpus2")(spark, d1)
      .agg(sum($"n_docs")).head().getLong(0)
    val a10 = SparkEntry.queries("q_pipeline_corpus2")(spark, d10)
      .agg(sum($"n_docs")).head().getLong(0)
    // same 2% corridor as the cc count: the keep decision rides the
    // banding-sensitive closure
    val want = Replicas * a1 + 1
    assert(math.abs(a10 - want) <= want / 50,
      s"expected ~$want kept docs at 10x (2% corridor), got $a10 (1x keeps $a1)")
    assertLinear("q_pipeline_corpus2", maxRatio = 7.0) // observed 3.2
  }

  test("q_join_fuzzy at 10x: replicas are invisible to each other, linear") {
    import spark.implicits._
    val (d1, d10) = dirs
    val n1 = SparkEntry.queries("q_join_fuzzy")(spark, d1).count()
    val n10 = SparkEntry.queries("q_join_fuzzy")(spark, d10).count()
    // the query's contract is a top-25 slice, so row count is invariant;
    // the two-char suffixes keep cross-replica distance >= 2, so the 10x
    // run generates exactly ten copies of the 1x candidate volume under
    // the hood — which is what the timing ratio below measures
    assert(n1 === 25L && n10 === n1, s"1x=$n1 10x=$n10")
    assertLinear("q_join_fuzzy", maxRatio = 12.0) // observed 5.9
  }

  // ---- the incremental family at 10x -------------------------------

  private val ZFamilies = 40
  private val ZBase = 20000000L
  private val BatchBase = 30000000L

  private def zText(f: Int, is: Seq[Int]) =
    is.map(i => f"zf$f%02dt$i%02d").mkString(" ")

  /** 40 disjoint two-cluster token families planted in the base: each
    * holds docs z00..z17 and z02..z19 (J = 0.8 — separate), waiting for
    * a batch bridge z00..z19 (J = 0.9 to both).
    */
  private def zBaseDocs(): DataFrame = {
    import spark.implicits._
    (0 until ZFamilies)
      .flatMap { f =>
        Seq(
          (ZBase + f * 2, "en", zText(f, 0 until 18)),
          (ZBase + f * 2 + 1, "en", zText(f, 2 until 20)))
      }
      .toDF("doc_id", "lang", "text")
  }

  /** The planted batch (ids above every base id — the monotone-ingest
    * invariant): bridges for every z family, exact copies and
    * drop-last-token near variants of replica content, and fresh docs.
    */
  private def incrBatch(): DataFrame = {
    import spark.implicits._
    val bridges = (0 until ZFamilies)
      .map(f => (BatchBase + f, "en", zText(f, 0 until 20)))
      .toDF("doc_id", "lang", "text")
    val exact = tagDocs(0)
      .filter($"doc_id" % 37 === 0)
      .select(($"doc_id" + lit(BatchBase + 1000000L)).as("doc_id"), $"lang", $"text")
    val near = tagDocs(5)
      .filter($"doc_id" % 41 === 0 && size(split($"text", " ")) >= 12)
      .select(
        ($"doc_id" + lit(BatchBase + 2000000L)).as("doc_id"),
        $"lang",
        concat_ws(" ", expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"))
          .as("text"))
    val fresh = spark.range(150)
      .select(
        ($"id" + lit(BatchBase + 3000000L)).as("doc_id"),
        lit("en").as("lang"),
        concat(lit("freshscale"), $"id", lit("solo unseen material")).as("text"))
    bridges.unionByName(exact).unionByName(near).unionByName(fresh)
  }

  private def assignMap(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** q_dedup_incr's engine at 10x: the APPLY side must (a) equal the full
    * rebuild restricted to batch rows — with planted exact, near, and
    * bridge paths all firing against the persisted index — (b) keep its
    * equi-join plan shape, and (c) cost a fraction of the rebuild and
    * stay flat as the BASE grows 10x (batch-sized work, not base-sized).
    */
  test("incremental dedup at 10x: delta == rebuild, apply is batch-sized") {
    import spark.implicits._
    import graft.ops.DedupOps
    val base1 = tagDocs(0).select($"doc_id", $"lang", $"text").unionByName(zBaseDocs())
    val base10 = (0 until Replicas)
      .map(k => tagDocs(k).select($"doc_id", $"lang", $"text"))
      .reduce(_ unionByName _)
      .unionByName(zBaseDocs())
    val batch = incrBatch().localCheckpoint(eager = true)

    def materializedIndex(base: DataFrame): (DataFrame, DataFrame) = {
      val (m, b) = DedupOps.buildDedupIndex(spark, base)
      (m.localCheckpoint(eager = true), b.localCheckpoint(eager = true))
    }
    val (md51, band1) = materializedIndex(base1)
    val (md510, band10) = materializedIndex(base10)

    // (a) identity at 10x, planted paths firing
    val got = assignMap(DedupOps.applyDedupDelta(spark, batch, md510, band10))
    val want = assignMap(
      DedupOps.fullAssign(spark, base10.unionByName(batch))
        .filter($"doc_id" >= BatchBase))
    assert(got === want, "delta-apply diverged from the full rebuild at 10x")
    val bridgeIds = (0 until ZFamilies).map(f => BatchBase + f)
    // A J~0.89 bridge rides each base doc with P(band hit) ~ 0.86 under
    // 2 bands of 4 rows, so a fixed seeded fraction of families miss one
    // side — identical in both compared paths (the identity above is the
    // correctness claim; these prove the closure path fires at 10x).
    val bridgeAttached =
      bridgeIds.count(f => got(f) < ZBase + (f - BatchBase) * 2 + 2)
    val bridgeClosed =
      bridgeIds.count(f => got(f) === ZBase + (f - BatchBase) * 2)
    assert(bridgeAttached >= (ZFamilies * 9) / 10,
      s"bridges attach to their families: $bridgeAttached/$ZFamilies")
    assert(bridgeClosed >= (ZFamilies * 6) / 10,
      s"bridges close their family to the min base id: $bridgeClosed/$ZFamilies")
    val exactIds = got.keys.filter(id => id >= BatchBase + 1000000L && id < BatchBase + 2000000L)
    assert(exactIds.nonEmpty && exactIds.forall(got(_) < ZBase),
      "exact copies attach to replica clusters through the md5 index")
    val nearIds = got.keys.filter(id => id >= BatchBase + 2000000L && id < BatchBase + 3000000L).toSeq
    val nearHits = nearIds.count(got(_) < ZBase)
    // J ~= 11/12 near-variants ride 2 bands of 4 rows: ~8% banding misses
    // are expected MinHash behavior (identical in both compared paths)
    assert(nearIds.size > 50 && nearHits >= (nearIds.size * 8) / 10,
      s"near variants attach through the band index: $nearHits/${nearIds.size}")
    val freshIds = got.keys.filter(_ >= BatchBase + 3000000L)
    assert(freshIds.forall(id => got(id) >= BatchBase), "fresh docs form new clusters")

    // (b) plan shape: the index probe stays a shuffled equi-join
    val probePlan = DedupOps
      .indexProbePairs(spark, DedupOps.hashedToksOf(batch), band10)
      .queryExecution.executedPlan.toString
    assert(!probePlan.contains("CartesianProduct") &&
      !probePlan.contains("BroadcastNestedLoopJoin"), probePlan)
    assert(probePlan.contains("ShuffledHashJoin"), probePlan)

    // (c) apply is batch-sized: warm, then compare against the rebuild
    // and against the same apply over the 1x index
    def applyOn(m: DataFrame, b: DataFrame): Unit =
      DedupOps.applyDedupDelta(spark, batch, m, b).foreach(_ => ())
    applyOn(md51, band1) // warmup
    val tApply1 = timed(applyOn(md51, band1))
    val tApply10 = timed(applyOn(md510, band10))
    val tRebuild10 = timed(
      DedupOps.fullAssign(spark, base10.unionByName(batch)).foreach(_ => ()))
    info(f"incr text: apply1x=$tApply1%.1fs apply10x=$tApply10%.1fs rebuild10x=$tRebuild10%.1fs")
    assert(tApply10 <= 0.6 * math.max(tRebuild10, 1.0),
      f"apply should be a fraction of the rebuild: $tApply10%.1fs vs $tRebuild10%.1fs")
    assert(tApply10 <= 4.0 * math.max(tApply1, 1.0),
      f"apply must scale with the batch, not the base: 1x=$tApply1%.1fs 10x=$tApply10%.1fs")
  }

  /** q_dedup_embed_incr's engine at 10x: same three claims for the
    * vector modality (pair contract — identity is exact, no closure).
    * Replicas are cyclic dimension shifts: norms and within-replica
    * similarities are preserved exactly, cross-replica cosines scatter.
    */
  test("incremental embed dedup at 10x: delta == rebuild, apply is batch-sized") {
    import spark.implicits._
    import graft.ops.{DedupOps, Vec}
    val EmbBatchBase = 1000000L
    def replica(k: Int): DataFrame = T(spark, Sf01, "embeddings")
      .select(
        ($"vec_id" + lit(k * 2000L)).as("vec_id"),
        (if (k == 0) $"embedding"
         else expr(s"concat(slice(embedding, ${k + 1}, ${64 - k}), slice(embedding, 1, $k))"))
          .as("embedding"))
    val base1 = replica(0)
    val base10 = (0 until Replicas).map(replica).reduce(_ unionByName _)
    // batch: exact copies of replica-3 vectors (cos = 1 pairs through the
    // index) plus the shift-17 "fresh" family (scattered cosines)
    val batch = replica(3)
      .filter($"vec_id" % 7 === 0)
      .select(($"vec_id" + lit(EmbBatchBase)).as("vec_id"), $"embedding")
      .unionByName(
        T(spark, Sf01, "embeddings").select(
          ($"vec_id" + lit(EmbBatchBase + 100000L)).as("vec_id"),
          expr("concat(slice(embedding, 18, 47), slice(embedding, 1, 17))").as("embedding")))
      .localCheckpoint(eager = true)

    val idx1 = DedupOps.buildEmbedIndex(spark, base1).localCheckpoint(eager = true)
    val idx10 = DedupOps.buildEmbedIndex(spark, base10).localCheckpoint(eager = true)

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairSet(DedupOps.applyEmbedDelta(spark, batch, idx10))
    val all = base10.unionByName(batch)
    val want = pairSet(
      DedupOps.verifyCosinePairsFrom(
        all.select($"vec_id", $"embedding", Vec.norm2($"embedding").as("n2")),
        DedupOps.embBandedCandidates(all))
        .filter($"b_id" >= EmbBatchBase))
    assert(got === want, "embed delta-apply diverged from the full rebuild at 10x")
    assert(got.exists { case (a, b) => a < EmbBatchBase && b >= EmbBatchBase },
      "index-probe pairs must fire (exact copies of replica-3 vectors)")

    def applyOn(idx: DataFrame): Unit =
      DedupOps.applyEmbedDelta(spark, batch, idx).foreach(_ => ())
    applyOn(idx1) // warmup
    val tApply1 = timed(applyOn(idx1))
    val tApply10 = timed(applyOn(idx10))
    val tRebuild10 = timed(
      DedupOps.verifyCosinePairsFrom(
        all.select($"vec_id", $"embedding", Vec.norm2($"embedding").as("n2")),
        DedupOps.embBandedCandidates(all)).foreach(_ => ()))
    info(f"incr embed: apply1x=$tApply1%.1fs apply10x=$tApply10%.1fs rebuild10x=$tRebuild10%.1fs")
    assert(tApply10 <= 0.8 * math.max(tRebuild10, 1.0),
      f"apply should undercut the rebuild: $tApply10%.1fs vs $tRebuild10%.1fs")
    assert(tApply10 <= 4.0 * math.max(tApply1, 1.0),
      f"apply must scale with the batch, not the base: 1x=$tApply1%.1fs 10x=$tApply10%.1fs")
  }

  // ---- the serving family at 10x -----------------------------------

  /** Bytes actually read off storage during `f`, via task input metrics
    * (drained deterministically through the listener-bus bridge).
    */
  private def measured(f: => Unit): (Double, Long) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val tap = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          bytes.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(tap)
    try {
      val t = timed(f)
      org.apache.spark.graftaccess.ListenerDrain.drain(spark.sparkContext, 30000)
      (t, bytes.get)
    } finally spark.sparkContext.removeSparkListener(tap)
  }

  private def dirBytes(dir: String): Long = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    var n = 0L
    while (it.hasNext) { val f = it.next(); if (f.isFile) n += f.getLen }
    n
  }

  /** The SERVING claim at 10x (the q_sim_served / q_index_bm25_served
    * SURVEY rows): a serve against a 10x base must stay PROBE-bound, not
    * base-bound — its storage reads are the probed partition slice (a
    * small, pruning-proven fraction of the index, where a base-bound
    * scan would read ~everything), and its wall-time grows with that
    * slice, far below the 10x of the base. (Strictly flat serving at a
    * growing corpus additionally scales the partition count — SignBits
    * with log(corpus), shards with vocabulary — which keeps the probed
    * slice itself constant-sized; partition-count scaling is a config,
    * the PRUNING is the architecture, and it is what this test pins.)
    */
  /** Replica k of the sf0.1 embeddings: shifted ids, cyclic dimension
    * shift — norms and within-replica similarities preserved exactly,
    * cross-replica cosines scatter.
    */
  private def evec(k: Int): DataFrame = {
    import spark.implicits._
    T(spark, Sf01, "embeddings")
      .select(
        ($"vec_id" + lit(k * 2000L)).as("vec_id"),
        (if (k == 0) $"embedding"
         else expr(s"concat(slice(embedding, ${k + 1}, ${64 - k}), slice(embedding, 1, $k))"))
          .as("embedding"))
  }

  test("serving at 10x: ANN and BM25 serves are probe-bound, reads bounded") {
    import spark.implicits._
    import graft.ops.{SimilarityOps, TextOps}
    val (d1, d10) = dirs
    val e1 = evec(0)
    val e10 = (0 until Replicas).map(evec).reduce(_ unionByName _)
    val ann1 = Files.createTempDirectory("graft_scale_ann1").toString
    val ann10 = Files.createTempDirectory("graft_scale_ann10").toString
    SimilarityOps.writeAnnIndexFor(spark, e1, ann1)
    SimilarityOps.writeAnnIndexFor(spark, e10, ann10)
    // the standard probe batch (first 5 vectors, Hamming-1 multi-probe)
    val probes = e1
      .select(
        $"vec_id", $"embedding",
        graft.ops.Vec.norm2($"embedding").as("n2"),
        SimilarityOps.bucketCol.as("bucket"))
      .filter($"vec_id" < 5)
      .select(
        $"vec_id".as("probe_id"), $"embedding".as("p"), $"n2".as("pn2"),
        explode(array(
          $"bucket" +: (0 until SimilarityOps.SignBits)
            .map(j => $"bucket".bitwiseXOR(lit(1L << j))): _*)).as("pbucket"))
      .localCheckpoint(eager = true)
    def serveAnn(idx: String): Unit =
      SimilarityOps.serveAnnBatch(spark, idx, probes).foreach(_ => ())
    serveAnn(ann1) // warm (codegen + listing first-touch)
    serveAnn(ann10)
    val (ta1, ba1) = measured(serveAnn(ann1))
    val (ta10, ba10) = measured(serveAnn(ann10))
    val annIdxBytes = dirBytes(ann10)
    info(f"ann serve: 1x=$ta1%.2fs 10x=$ta10%.2fs read10x=${ba10 / 1e6}%.1fMB " +
      f"of ${annIdxBytes / 1e6}%.1fMB index")
    // probe-bound reads: the serve touches the probed bucket dirs only —
    // a bounded fraction of the index (a base-bound scan reads ~all)
    assert(ba10 > 0 && ba10 < annIdxBytes / 2,
      f"ANN serve read ${ba10 / 1e6}%.1fMB of a ${annIdxBytes / 1e6}%.1fMB index")
    // and the read slice grows with the probed partitions (~10x their 1x
    // size), never quadratically
    assert(ba10 <= 15L * math.max(ba1, 1L << 20),
      s"ANN serve reads grew superlinearly: $ba1 -> $ba10")
    // wall-time: far below base-bound growth (floored: sub-second serves
    // are scheduling noise)
    assert(ta10 <= 6.0 * math.max(ta1, 1.0),
      f"ANN serve wall-time is base-bound: 1x=$ta1%.2fs 10x=$ta10%.2fs")

    // BM25: untagged replicas (shifted ids, same text) so the fixed
    // query terms keep matching; postings grow 10x, the probed tshard
    // slice must stay the read set
    def docRep(k: Int): DataFrame = T(spark, Sf01, "documents")
      .select(($"doc_id" + lit(k * 5000L)).as("doc_id"), $"lang", $"text")
    val bm1 = Files.createTempDirectory("graft_scale_bm1").toString
    val bm10 = Files.createTempDirectory("graft_scale_bm10").toString
    TextOps.writeBm25IndexFrom(spark, docRep(0), bm1)
    TextOps.writeBm25IndexFrom(
      spark, (0 until Replicas).map(docRep).reduce(_ unionByName _), bm10)
    def serveBm(idx: String): Unit =
      TextOps.serveBm25(spark, idx).foreach(_ => ())
    serveBm(bm1) // warm
    serveBm(bm10)
    val (tb1, bb1) = measured(serveBm(bm1))
    val (tb10, bb10) = measured(serveBm(bm10))
    val bmIdxBytes = dirBytes(bm10)
    info(f"bm25 serve: 1x=$tb1%.2fs 10x=$tb10%.2fs read10x=${bb10 / 1e6}%.1fMB " +
      f"of ${bmIdxBytes / 1e6}%.1fMB index")
    assert(bb10 > 0 && bb10 < bmIdxBytes / 2,
      f"BM25 serve read ${bb10 / 1e6}%.1fMB of a ${bmIdxBytes / 1e6}%.1fMB index")
    assert(bb10 <= 15L * math.max(bb1, 1L << 20),
      s"BM25 serve reads grew superlinearly: $bb1 -> $bb10")
    assert(tb10 <= 6.0 * math.max(tb1, 1.0),
      f"BM25 serve wall-time is base-bound: 1x=$tb1%.2fs 10x=$tb10%.2fs")
  }

  /** The remaining two persisted serving tiers at 10× — the quantized
    * int8 scan (q_sim_quantized_served) and the IVF cell index
    * (q_sim_ivf_served) — under the same probe-bound contract as the
    * ANN/BM25 test above: storage reads stay a bounded fraction of the
    * grown index (both prune to the probed bucket/cell directories via
    * literal INSET filters), grow ~with the probed slice, and serve
    * wall-time stays far below base-bound growth. Both indexes are built
    * against the SAME 1× probe/codebook state, so the probed slice is
    * identical at both scales by construction.
    */
  test("serving at 10x: quantized and IVF serves are probe-bound, reads bounded") {
    import spark.implicits._
    import graft.ops.{SimilarityOps, Vec}
    val e1 = evec(0)
    val e10 = (0 until Replicas).map(evec).reduce(_ unionByName _)

    // quantized scan tier
    val q1 = Files.createTempDirectory("graft_scale_q1").toString
    val q10 = Files.createTempDirectory("graft_scale_q10").toString
    SimilarityOps.writeQuantIndexFor(spark, e1, q1)
    SimilarityOps.writeQuantIndexFor(spark, e10, q10)
    val qprobes = SimilarityOps
      .quantProbe(SimilarityOps.quantizedFrame(e1.select($"vec_id", $"embedding")))
      .localCheckpoint(eager = true)
    def serveQ(idx: String): Unit =
      SimilarityOps.serveQuantBatchMulti(spark, Seq(idx), qprobes).foreach(_ => ())
    serveQ(q1) // warm
    serveQ(q10)
    val (tq1, bq1) = measured(serveQ(q1))
    val (tq10, bq10) = measured(serveQ(q10))
    val qIdxBytes = dirBytes(q10)
    info(f"quant serve: 1x=$tq1%.2fs 10x=$tq10%.2fs read10x=${bq10 / 1e6}%.1fMB " +
      f"of ${qIdxBytes / 1e6}%.1fMB index")
    assert(bq10 > 0 && bq10 < qIdxBytes / 2,
      f"quant serve read ${bq10 / 1e6}%.1fMB of a ${qIdxBytes / 1e6}%.1fMB index")
    assert(bq10 <= 15L * math.max(bq1, 1L << 20),
      s"quant serve reads grew superlinearly: $bq1 -> $bq10")
    assert(tq10 <= 6.0 * math.max(tq1, 1.0),
      f"quant serve wall-time is base-bound: 1x=$tq1%.2fs 10x=$tq10%.2fs")

    // IVF cell tier: both scales assigned against the SAME stand-in
    // codebook (the 1x head vectors), so the probes rank identical cells
    val withN2 = (e: org.apache.spark.sql.DataFrame) =>
      e.select($"vec_id", $"embedding", Vec.norm2($"embedding").as("n2"))
    val cents = withN2(e1)
      .filter($"vec_id" < 16)
      .select($"vec_id".as("c_id"), $"embedding".as("c"), $"n2".as("cn2"))
      .localCheckpoint(eager = true)
    val i1 = Files.createTempDirectory("graft_scale_ivf1").toString
    val i10 = Files.createTempDirectory("graft_scale_ivf10").toString
    SimilarityOps.writeIvfIndexFrom(spark, withN2(e1), cents, i1)
    SimilarityOps.writeIvfIndexFrom(spark, withN2(e10), cents, i10)
    val iprobes = withN2(e1).filter($"vec_id" < 5).localCheckpoint(eager = true)
    def serveI(idx: String): Unit =
      SimilarityOps.serveIvfBatchMulti(spark, Seq(idx), iprobes).foreach(_ => ())
    serveI(i1) // warm
    serveI(i10)
    val (ti1, bi1) = measured(serveI(i1))
    val (ti10, bi10) = measured(serveI(i10))
    val iIdxBytes = dirBytes(s"$i10/cells")
    info(f"ivf serve: 1x=$ti1%.2fs 10x=$ti10%.2fs read10x=${bi10 / 1e6}%.1fMB " +
      f"of ${iIdxBytes / 1e6}%.1fMB index")
    assert(bi10 > 0 && bi10 < iIdxBytes / 2,
      f"ivf serve read ${bi10 / 1e6}%.1fMB of a ${iIdxBytes / 1e6}%.1fMB index")
    assert(bi10 <= 15L * math.max(bi1, 1L << 20),
      s"ivf serve reads grew superlinearly: $bi1 -> $bi10")
    assert(ti10 <= 6.0 * math.max(ti1, 1.0),
      f"ivf serve wall-time is base-bound: 1x=$ti1%.2fs 10x=$ti10%.2fs")
  }

  test("q_index_inverted at 10x: disjoint vocabularies, bounded postings, linear") {
    import spark.implicits._
    val (d1, d10) = dirs
    val n1 = SparkEntry.queries("q_index_inverted")(spark, d1).count()
    val n10 = SparkEntry.queries("q_index_inverted")(spark, d10).count()
    // every replica contributes its own vocabulary; the hot docs add
    // 30 shared + 500 unique tokens; token df is exact (no banding), so
    // this identity has no corridor
    assert(n1 > 0, "1x index is empty - the token filter rejected the tags")
    assert(n10 === Replicas * n1 + 30 + HotDocs,
      s"expected ${Replicas * n1 + 30 + HotDocs} index rows, got $n10")
    assertLinear("q_index_inverted", maxRatio = 4.0) // observed 1.5
  }

  /** BPE training at production depth (verdict-r9 #6): a tokenizer build
    * runs hundreds of merge rounds, not the registry's 4. Drive trainBpe
    * to 64 rounds over the 10× corpus and pin the three properties that
    * make that affordable at 100 TB:
    *
    *  - the corpus is touched ONCE — the histogram build — no matter how
    *    deep the training runs (file-scan stage budget ≤ 2, the same
    *    budget BpeTrainSpec pins at 4 rounds);
    *  - per-round cost is VOCABULARY-sized and flat: round r's work does
    *    not grow with r (a lineage leak or checkpoint pileup shows up as
    *    monotonically slower rounds);
    *  - training state is bounded: the checkpoint swap releases round
    *    r-1's materialized vocabulary when round r lands, so executor
    *    storage holds O(1) copies, not O(rounds).
    *
    * Correctness at depth rides the independent driver-side trainer
    * (BpeReference — no Spark, no SQL): all 64 argmax pairs and counts
    * must agree.
    */
  test("bpe training at 64 rounds on 10x: one corpus scan, flat rounds, bounded state") {
    import spark.implicits._
    val (_, d10) = dirs
    val Rounds = 64

    val group = s"bpe-depth-${System.nanoTime()}"
    val scanStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (group == j.properties.getProperty("spark.jobGroup.id"))
          j.stageInfos.foreach(si =>
            if (si.rddInfos.exists(_.name.contains("FileScan")))
              scanStages.add(si.stageId))
    }
    spark.sparkContext.addSparkListener(listener)
    val roundTimes = collection.mutable.ArrayBuffer.empty[Double]
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val merges =
      try {
        spark.sparkContext.setJobGroup(group, "bpe depth")
        try graft.ops.TextOps
          .trainBpe(spark, d10, Rounds, (_, t) => roundTimes += t)
          ._1
        finally spark.sparkContext.clearJobGroup()
      } finally spark.sparkContext.removeSparkListener(listener)

    assert(merges.size === Rounds, s"training converged early: ${merges.size}")
    // a merged pair can never re-form (merges only concatenate), so the
    // 64 argmax pairs are necessarily distinct — a repeat means the fold
    // failed to apply a round's merge
    assert(merges.map(_._2).distinct.size === Rounds, "argmax pair repeated")

    // one corpus scan for the whole 64-round run
    org.apache.spark.graftaccess.ListenerDrain.drain(spark.sparkContext, 60000)
    val scans = { import scala.jdk.CollectionConverters._; scanStages.iterator().asScala.size }
    assert(scans > 0, "listener captured nothing — scoping broke")
    assert(scans <= 2, s"file-scan stages across 64 rounds: $scans (budget 2)")

    // flat per-round cost: the last quarter must not run materially
    // slower than the first (a per-round leak compounds 48 rounds deep
    // by then); 3x + slack absorbs host noise, not growth
    val head = roundTimes.take(16).sum / 16
    val tail = roundTimes.takeRight(16).sum / 16
    info(f"round cost: first16=${head}%.3fs last16=${tail}%.3fs")
    assert(tail <= 3.0 * head + 0.25,
      f"per-round cost grew with depth: first16=$head%.3fs last16=$tail%.3fs")

    // bounded training state: only the final round's checkpoint survives
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- persistedBefore
    assert(leaked.size <= 2,
      s"checkpoint pileup: ${leaked.size} persistent RDDs left by training")
    leaked.foreach(id =>
      spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

    // depth correctness: all 64 rounds agree with the independent
    // driver-side trainer on the 10x histogram
    val hist = T(spark, d10, "documents")
      .select(explode(split(lower($"text"), " ")).as("term"))
      .filter($"term".rlike("^[a-z0-9]{3,}$"))
      .groupBy($"term")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val want = BpeReference.train(hist, Rounds)
    assert(merges == want,
      s"first diff: ${merges.zip(want).find(p => p._1 != p._2)}")
  }

  /** SemDeDup at 10×: k = max(16, ⌈√N⌉) grows with the corpus, so total
    * work (N·k assignment + ~N²/k within-cell pairs) is N^1.5 — the
    * documented SUBQUADRATIC contract of the q_dedup_semantic SURVEY
    * row. Theoretical wall ratio at 10× volume is ~31.6 (constants at
    * this size keep the observed ratio near 2.4); the bound is ~3× the
    * observed ratio and far below the ~100× a fixed-k (or all-pairs)
    * regression would show. Replicas are cyclic dimension
    * shifts (norms exact, cross-replica cosines scatter), so the 10×
    * corpus carries real cross-replica cell mixing, not ten disjoint
    * problems.
    */
  test("semantic dedup at 10x: sqrt-N cells keep the prune subquadratic") {
    import spark.implicits._
    val d1 = Files.createTempDirectory("graft_scale_sem1").toString
    val d10 = Files.createTempDirectory("graft_scale_sem10").toString
    evec(0).write.mode("overwrite").parquet(s"$d1/embeddings.parquet")
    (0 until Replicas).map(evec).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$d10/embeddings.parquet")
    val q = SparkEntry.queries("q_dedup_semantic")
    val p = q(spark, d10).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "within-cell prune must stay an equi-join on cell")
    q(spark, d1).foreach(_ => ()) // warmup (codegen + first-touch)
    val t1 = timed(q(spark, d1).foreach(_ => ()))
    val t10 = timed(q(spark, d10).foreach(_ => ()))
    val n10 = q(spark, d10).count()
    val total10 = spark.read.parquet(s"$d10/embeddings.parquet").count()
    val ratio = t10 / math.max(t1, 1.0)
    info(f"semantic: 1x=$t1%.1fs 10x=$t10%.1fs ratio=$ratio%.1f survivors=$n10/$total10")
    assert(n10 > 0 && n10 < total10,
      s"10x prune must drop some but not all rows: $n10 of $total10")
    // load-independent proxy (advice r10: wall-clock ratios on shared
    // hosts can flake): the within-cell candidate PAIRS — the prune's
    // actual work — must grow ≈ N^1.5/√k ≈ 10^1.5 ≈ 32×, far below the
    // quadratic 100× an unclustered prune would do. The time bound stays
    // as a generous backstop.
    def pairsOf(d: String): Double =
      SparkEntry.queries("q_cluster_stats")(spark, d)
        .agg(sum(($"n_vecs" * ($"n_vecs" - lit(1))).cast("double") / 2))
        .head().getDouble(0)
    val (p1, p10) = (pairsOf(d1), pairsOf(d10))
    info(f"semantic pairs: 1x=$p1%.0f 10x=$p10%.0f ratio=${p10 / p1}%.1f")
    assert(p10 <= 60.0 * p1,
      f"within-cell pair count left the N^1.5 envelope: $p1%.0f -> $p10%.0f")
    assert(ratio <= 8.0,
      f"semantic dedup grew beyond the N^1.5 envelope (ratio $ratio%.1f)")
  }

  /** The INCREMENTAL semantic apply at 10× (verdict-r10 #3, the
    * q_dedup_semantic_incr SURVEY row): one batch committed against a
    * 10× persisted cell store must do O(batch + probed slice) work —
    * undercutting the monolithic re-prune and scaling with the batch,
    * not the base — while the merged survivor set stays exactly the
    * monolithic answer under the pinned epoch codebook.
    */
  test("incremental semantic dedup at 10x: delta == rebuild, apply is batch-sized") {
    import spark.implicits._
    import graft.ops.{SimilarityOps, StreamOps, Vec}
    val SemBatchBase = 1000000L
    val base1 = evec(0)
    val base10 = (0 until Replicas).map(evec).reduce(_ unionByName _)
    val idx1 = Files.createTempDirectory("graft_scale_semi1").toString
    val idx10 = Files.createTempDirectory("graft_scale_semi10").toString
    StreamOps.seedSemanticIndex(spark, base1, idx1)
    StreamOps.seedSemanticIndex(spark, base10, idx10)
    // batch: exact copies of replica-3 vectors (within-cell cos = 1
    // witnesses through the persisted store) plus a shift-17 fresh
    // family; ids above every base id (the monotone-ingest contract)
    val batch = evec(3)
      .filter($"vec_id" % 7 === 0)
      .select(($"vec_id" + lit(SemBatchBase)).as("vec_id"), $"embedding")
      .unionByName(
        T(spark, Sf01, "embeddings").select(
          ($"vec_id" + lit(SemBatchBase + 100000L)).as("vec_id"),
          expr("concat(slice(embedding, 18, 47), slice(embedding, 1, 17))").as("embedding")))
      .localCheckpoint(eager = true)

    def applyOn(idx: String): Unit =
      graft.index.GenLog.commitGeneration(
        StreamOps.semFamily(idx), batch, idx, batchId = 0L)
    applyOn(idx1) // warmup (codegen; the overwrite retry is idempotent)
    val tApply1 = timed(applyOn(idx1))
    val tApply10 = timed(applyOn(idx10))

    // delta == rebuild at 10x: merged survivor logs ≡ the monolithic
    // prune of base ∪ batch under the same pinned epoch codebook
    val cents10 = spark.read.parquet(s"$idx10/v0/full/cents")
    val all10 = base10.unionByName(batch)
      .select($"vec_id", $"embedding")
      .withColumn("n2", Vec.norm2($"embedding"))
    // the rebuild alternative the apply must undercut is RE-SEEDING the
    // store (assign + prune + write EVERYTHING — what a daily full
    // rebuild would do), not a compute-only prune: the apply itself
    // pays generation-write I/O, so the baseline must too
    val tRebuild10 = timed(
      SimilarityOps.writeSemSeedWith(
        spark, all10, cents10,
        s"${Files.createTempDirectory("graft_scale_semi_rb").toString}/full"))
    assert(
      StreamOps.serveSemanticContinuous(spark, idx10)
        .collect().map(_.toString).toSeq ===
        SimilarityOps.semSurvivorsWith(all10, cents10)
          .orderBy($"vec_id").collect().map(_.toString).toSeq,
      "semantic delta-apply diverged from the full rebuild at 10x")

    info(f"incr semantic: apply1x=$tApply1%.1fs apply10x=$tApply10%.1fs rebuild10x=$tRebuild10%.1fs")
    // 0.9, not 0.8: single-measurement wall times under a loaded full-
    // suite JVM jitter ~10% (r12 observed 0.82 mid-suite, 0.74 alone);
    // the batch-sized contract is the 4×-of-1× assert below — this one
    // only needs the apply to genuinely undercut a full re-seed
    assert(tApply10 <= 0.9 * math.max(tRebuild10, 1.0),
      f"apply should undercut the rebuild: $tApply10%.1fs vs $tRebuild10%.1fs")
    assert(tApply10 <= 4.0 * math.max(tApply1, 1.0),
      f"apply must scale with the batch, not the base: 1x=$tApply1%.1fs 10x=$tApply10%.1fs")
  }

  /** q_cluster_terms at 10× (verdict-r10 #3): the cluster-labeling
    * inverted-token pass — explode to (cell, term), one hash aggregate,
    * one window per cell — must stay ~linear in the corpus. Structural
    * bound alongside the time ratio: the output is ≤ 3 rows per cell
    * and k grows as ⌈√N⌉, so rows grow ≈ √10, not 10×.
    */
  test("q_cluster_terms at 10x: the labeling pass is linear, output sqrt-bounded") {
    import spark.implicits._
    val d1 = Files.createTempDirectory("graft_scale_ct1").toString
    val d10 = Files.createTempDirectory("graft_scale_ct10").toString
    // documents and embeddings replicated under the SAME id shift (5000
    // clears the 0..4999 doc_id range; embedding ids keep gaps, which is
    // fine — the linkage needs doc_id = vec_id, not density)
    def docAligned(k: Int): DataFrame = T(spark, Sf01, "documents")
      .select(($"doc_id" + lit(k * 5000L)).as("doc_id"), $"lang", $"text")
    def evecAligned(k: Int): DataFrame = T(spark, Sf01, "embeddings")
      .select(
        ($"vec_id" + lit(k * 5000L)).as("vec_id"),
        (if (k == 0) $"embedding"
         else expr(s"concat(slice(embedding, ${k + 1}, ${64 - k}), slice(embedding, 1, $k))"))
          .as("embedding"))
    evecAligned(0).write.mode("overwrite").parquet(s"$d1/embeddings.parquet")
    docAligned(0).write.mode("overwrite").parquet(s"$d1/documents.parquet")
    (0 until Replicas).map(evecAligned).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$d10/embeddings.parquet")
    (0 until Replicas).map(docAligned).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$d10/documents.parquet")
    val q = SparkEntry.queries("q_cluster_terms")
    q(spark, d1).foreach(_ => ()) // warmup
    val t1 = timed(q(spark, d1).foreach(_ => ()))
    val t10 = timed(q(spark, d10).foreach(_ => ()))
    val (n1, n10) = (q(spark, d1).count(), q(spark, d10).count())
    val ratio = t10 / math.max(t1, 1.0)
    info(f"cluster terms: 1x=$t1%.1fs 10x=$t10%.1fs ratio=$ratio%.1f rows=$n1->$n10")
    assert(n10 <= n1 * 6,
      s"labeled rows must grow ~sqrt(10) with k, not 10x: $n1 -> $n10")
    assert(ratio <= 6.0,
      f"cluster labeling grew superlinearly (ratio $ratio%.1f)")
  }

  /** q_text_boilerplate at 10× (verdict-r11 #3): the shingle-frequency
    * pass is linear, the 500-doc hot chrome resolves exactly, and the
    * df-FRACTION variant's cut actually scales — at 10× the fraction
    * threshold (~0.2 % of ~50 k docs ≈ 101) suppresses the replica-local
    * duplicate families the fixed ≥3 cut saturates on, while the hot
    * chrome (nd = 500) stays boilerplate under both.
    */
  test("q_text_boilerplate at 10x: linear, hot chrome exact, frac cut scales with corpus") {
    import spark.implicits._
    val (_, d10) = dirs
    assertLinear("q_text_boilerplate", 10.0) // observed 3.7 alone, 6.6 under full-suite load
    val rep10 = SparkEntry.queries("q_text_boilerplate")(spark, d10)
      .localCheckpoint(eager = true)
    // every hot doc: 31 tokens → 29 shingles; the 28 chrome-only
    // 3-shingles are in all 500 hot docs (boilerplate), the 29th carries
    // the per-doc unique tail (not)
    val hot = rep10.filter($"doc_id" >= HotBaseId)
    assert(hot.count() === HotDocs.toLong)
    assert(
      hot.filter($"n_shingles" =!= 29L || $"n_boiler" =!= 28L).count() === 0L,
      "hot-chrome documents must report exactly 28/29 boilerplate shingles")
    val frac10 = SparkEntry.queries("q_text_boilerplate_frac")(spark, d10)
      .localCheckpoint(eager = true)
    assert(
      frac10.filter($"doc_id" >= HotBaseId)
        .filter($"n_boiler" =!= 28L).count() === 0L,
      "the 500-doc chrome must stay boilerplate under the scaled cut")
    val fixedBoiler = rep10.agg(sum($"n_boiler")).head().getLong(0)
    val fracBoiler = frac10.agg(sum($"n_boiler")).head().getLong(0)
    assert(fracBoiler < fixedBoiler,
      s"the scaled cut must be strictly stricter at 10x than the fixed >=3 " +
        s"(fixed $fixedBoiler, frac $fracBoiler)")
  }

  /** q_text_passage_dup at 10×: same linear shape as the boilerplate
    * pass (gram explode → one hash agg → 1:1 equi-join → one window),
    * and the 500-doc hot chrome resolves exactly: 27 5-grams per hot
    * doc, the 26 chrome-only ones shared by all 500, interval union
    * [1,30] of 31 tokens — one span, 30 covered.
    */
  test("q_text_passage_dup at 10x: linear, hot chrome interval-union exact") {
    import spark.implicits._
    val (_, d10) = dirs
    assertLinear("q_text_passage_dup", 10.0)
    val hot = SparkEntry.queries("q_text_passage_dup")(spark, d10)
      .filter($"doc_id" >= HotBaseId)
      .localCheckpoint(eager = true)
    assert(hot.count() === HotDocs.toLong)
    assert(
      hot.filter($"n_tokens" =!= 31L || $"n_covered" =!= 30L || $"n_spans" =!= 1L)
        .count() === 0L,
      "hot-chrome documents must cover exactly the 30-token chrome span")
  }

  /** The boilerplate operator's natural skew adversary: ONE shingle
    * present in EVERY document. The frequency side is distinct-by-shingle,
    * so the occurrence⋈frequency join fans out 1:1 per occurrence — the
    * hot key contributes N joined rows, never N² — and the report stays
    * exact. Asserted structurally (joined cardinality + no nested-loop
    * join in the plan), not just by wall time.
    */
  test("boilerplate skew: a shingle in EVERY document joins 1:1, never quadratically") {
    import spark.implicits._
    val n = 20000L
    val docsDf = spark.range(n).select(
      $"id".as("doc_id"),
      // 5 tokens: global chrome shingle uniq<id> tail<id> → 3 shingles,
      // of which (global chrome shingle) is in EVERY document
      concat(lit("global chrome shingle uniq"), $"id", lit(" tail"), $"id")
        .as("text"))
    val counts = graft.ops.TextOps.shingleCountsOf(docsDf)
      .localCheckpoint(eager = true)
    val dfreq = counts.groupBy($"s3").agg(count(lit(1)).as("nd"))
    val joined = counts.join(dfreq, Seq("s3"))
    // 1:1 fan-out: every occurrence row joins exactly one frequency row
    assert(joined.count() === 3L * n,
      "the hot shingle must join 1:1 per occurrence, not N^2")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"boilerplate join degenerated to a nested loop:\n$plan")
    val rep = graft.ops.TextOps.boilerplateReportOf(counts)
    assert(
      rep.filter($"n_shingles" =!= 3L || $"n_boiler" =!= 1L).count() === 0L,
      "every doc must report exactly its one universal shingle as boilerplate")
  }

  /** The corpus-scale contract contrast (verdict-r12 #1): a growing
    * corpus whose documents RECOMBINE A SHARED PHRASE POOL — how
    * natural language behaves at 100 TB: common phrases appear in ever
    * more documents as the corpus grows, long passages only in genuine
    * copies — saturates the df ≥ 2 cut (median dup_frac rises toward
    * 1.0 with document count, scrubbing everything) while the
    * ≥ 50-token min-match contract stays at EXACTLY zero coverage…
    * yet still fires on a genuinely copied passage planted in the big
    * corpus. Deterministic construction: doc i's 12 phrases are
    * splitmix64-selected from a 400-phrase pool, so no two documents
    * chain 9+ consecutive phrases (400⁹ sequences) unless planted.
    */
  test("passage contract at corpus growth: df cut saturates, 50-token contract does not") {
    import spark.implicits._
    def smix(z0: Long): Long = {
      var x = z0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    val phrases = (0 until 400)
      .map(p => (0 until 5).map(t => s"ph${p}w$t").mkString(" "))
    def doc(i: Int): String = (0 until 12)
      .map(j => phrases(java.lang.Long.remainderUnsigned(smix(i * 4096L + j), 400L).toInt))
      .mkString(" ")
    val copied = (0 until 60).map(i => s"copied$i").mkString(" ")
    def stage(n: Int, plantCopy: Boolean): String = {
      val dir = Files.createTempDirectory(s"graft_scale_sat$n").toString
      val base = (0 until n).map(i => (i.toLong, doc(i)))
      val planted =
        if (plantCopy)
          Seq((n.toLong, s"$copied lead1 lead2 lead3 lead4 lead5"),
            (n + 1L, s"tail1 tail2 tail3 tail4 tail5 $copied"))
        else Seq.empty
      import spark.implicits._
      (base ++ planted)
        .map { case (d, t) => (d, t, "en", "synthetic", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(8)
        .write.parquet(s"$dir/documents.parquet")
      dir
    }
    def median(df: DataFrame): Double = {
      val xs = df.select($"dup_frac").collect().map(_.getDouble(0)).sorted
      xs(xs.length / 2)
    }
    val (small, big) = (stage(20, plantCopy = false), stage(1000, plantCopy = true))
    val plainSmall = median(SparkEntry.queries("q_text_passage_dup")(spark, small))
    val plainBig = median(SparkEntry.queries("q_text_passage_dup")(spark, big))
    info(f"df>=2 cut median dup_frac: 20 docs $plainSmall%.2f -> 1000 docs $plainBig%.2f")
    assert(plainSmall < 0.7, "the small corpus must start unsaturated")
    assert(plainBig > 0.95 && plainBig > plainSmall + 0.25,
      f"the fixed df cut must SATURATE as the corpus grows " +
        f"($plainSmall%.2f -> $plainBig%.2f)")
    // the 50-token contract: zero coverage on every recombined doc at
    // BOTH scales — growth does not move it — while the one genuine
    // copy pair is caught exactly
    val minBig = SparkEntry.queries("q_text_passage_dup50")(spark, big)
      .localCheckpoint(eager = true)
    assert(median(minBig) === 0.0)
    assert(minBig.filter($"dup_frac" > 0.0).count() === 2L,
      "exactly the two planted copies flag under the 50-token contract")
    assert(minBig.filter($"doc_id" >= 1000L)
      .filter($"n_covered" =!= 60L).count() === 0L,
      "the planted 60-token copy must be covered exactly")
    val minSmall = SparkEntry.queries("q_text_passage_dup50")(spark, small)
    assert(minSmall.agg(sum($"n_covered")).head().getLong(0) === 0L)
  }
}
