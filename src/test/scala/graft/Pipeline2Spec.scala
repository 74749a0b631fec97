package graft

import org.apache.spark.sql.functions._

/** q_pipeline_corpus2 — the production corpus build (gate → exact dedup →
  * near-dup cluster closure → split → accounting) — checked against an
  * INDEPENDENT composition: the gate/dedup/split stages re-derived with
  * plain DataFrame ops and the transitive closure computed by a
  * driver-side union-find over the collected verified pair set (fine at
  * spec scale; the product query never collects). Plus the plan claim:
  * the final job downstream of the closure is one join + one aggregate +
  * the output sort.
  */
class Pipeline2Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def unionFind(n: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(v => v -> v): _*)
    def find(v: Long): Long = {
      var r = v
      while (parent(r) != r) r = parent(r)
      var c = v
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
    }
    n.map(v => v -> find(v)).toMap
  }

  test("q_pipeline_corpus2 equals gate -> exact dedup -> union-find closure -> split, composed independently") {
    import spark.implicits._
    val wMd5 = org.apache.spark.sql.expressions.Window
      .partitionBy(md5($"text")).orderBy($"doc_id")
    val tkDf = T(spark, sf, "documents")
      .withColumn("tk", split(coalesce($"text", lit("")), " "))
    // independent derivation of the repetition gate: HOF chain + explode +
    // count shuffle, NOT the fused BigramStats kernel the product uses
    val stats = tkDf
      .filter(size($"tk") >= 2)
      .select(
        $"doc_id",
        explode(expr(
          "transform(sequence(1, size(tk) - 1), i -> concat(tk[i-1], ' ', tk[i]))"))
          .as("b"))
      .groupBy($"doc_id", $"b").count()
      .groupBy($"doc_id")
      .agg(sum($"count").as("tot"), count(lit(1)).as("dist"), max($"count").as("top"))
    val gated = tkDf
      .join(stats, "doc_id") // inner: docs without bigrams are rejected
      .filter($"n_chars" >= 100 &&
        size(array_distinct($"tk")).cast("double") / size($"tk").cast("double") > 0.3 &&
        ($"tot" - $"dist").cast("double") / $"tot".cast("double") <= 0.08 &&
        $"top".cast("double") / $"tot".cast("double") <= 0.08)
      .withColumn("rn", row_number().over(wMd5))
      .filter($"rn" === 1)
      .select($"doc_id", $"lang", $"n_chars", $"text")
      .cache()
    // the verified pair set over the gated survivors, via the same banded
    // machinery the product uses — the CLOSURE is what this spec derives
    // independently (driver-side union-find vs the distributed loop)
    val pairs = graft.ops.DedupOps
      .bandedJaccardPairs(spark, graft.ops.DedupOps.hashedToksOf(gated), 9, 10)
      .select($"a_id", $"b_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val ids = gated.select($"doc_id").as[Long].collect().toSeq
    val label = unionFind(ids, pairs)
    val keepIds = ids.filter(v => label(v) == v).toSet
    val expected = gated
      .filter($"doc_id".isin(keepIds.toSeq: _*))
      .select(
        $"lang",
        $"n_chars",
        when(pmod(graft.ops.Hashing.h32($"doc_id".cast("string")), lit(100L)) < 80, "train")
          .when(pmod(graft.ops.Hashing.h32($"doc_id".cast("string")), lit(100L)) < 90, "valid")
          .otherwise("test")
          .as("split"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy("split", "lang")
      .collect()
      .toSeq
    val got = q("q_pipeline_corpus2").collect().toSeq
    assert(got == expected, s"got=$got expected=$expected")
    gated.unpersist()
  }

  test("q_pipeline_corpus2 final job is one join + one aggregate + the output sort") {
    // Plan downstream of the (checkpointed) closure: universe ⋈ labels,
    // the keep filter, one hash aggregate, one range sort. Exchanges in
    // the visible plan: gate's md5 window, the join's two sides, the
    // aggregate, the sort — anything beyond 5 means a stage re-shuffled.
    val p = q("q_pipeline_corpus2").queryExecution.executedPlan.toString
    val n = "Exchange".r.findAllIn(p).size
    assert(n <= 5, s"expected <= 5 exchanges in the final job, got $n:\n$p")
  }

  test("q_pipeline_corpus2 whole-run shuffle budget across ALL jobs") {
    // The final-job plan above can't see the checkpointed stages (gate,
    // band self-join, closure rounds), so this counts what actually RAN:
    // every stage that wrote shuffle records, across every job the query
    // triggers, scoped by job group. Measured 23 at sf0.001 — the gate
    // md5 window, the ONE band-join exchange (reuse keeps it one), the
    // slim pair distinct, per-round closure joins over the contracted
    // edge set, and the final join/agg/sort. A breach means a checkpoint
    // moved (gate or pairs re-computing per consumer) or the band join's
    // exchange reuse broke — each of which re-runs data-sized work.
    val group = s"p2-budget-${System.nanoTime()}"
    val shuffleStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val groupStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (group == j.properties.getProperty("spark.jobGroup.id"))
          j.stageInfos.foreach(si => groupStages.add(si.stageId))
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null && m.shuffleWriteMetrics.recordsWritten > 0)
          shuffleStages.add(sc.stageInfo.stageId)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "pipeline2 shuffle budget")
      try q("q_pipeline_corpus2").collect()
      finally spark.sparkContext.clearJobGroup()
      // listener events are async; deterministically drain the bus rather
      // than sleeping (a loaded host can deliver completions late)
      org.apache.spark.graftaccess.ListenerDrain.drain(spark.sparkContext, 60000)
      val paid = shuffleStages.asScala.toSet
        .intersect(groupStages.asScala.toSet).size
      assert(paid > 0, "listener captured nothing — scoping broke")
      assert(paid <= 26, s"shuffle-writing stages across the whole run: $paid (budget 26)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private implicit class SetAsScala[T](s: java.util.Set[T]) {
    def asScala: Iterable[T] = {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
    }
  }
}
