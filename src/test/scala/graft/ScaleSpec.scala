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
    * means ratio ≈ 10; the bound of 25 has room for fixed overheads and
    * host noise while still failing an accidentally quadratic shape
    * (ratio ≈ 100). Small denominators are floored at 1 s so a fast 1×
    * run cannot manufacture a flaky ratio.
    */
  private def assertLinear(name: String): Unit = {
    val (d1, d10) = dirs
    val q = SparkEntry.queries(name)
    q(spark, d1).foreach(_ => ()) // warmup
    val t1 = timed(q(spark, d1).foreach(_ => ()))
    val t10 = timed(q(spark, d10).foreach(_ => ()))
    val ratio = t10 / math.max(t1, 1.0)
    info(f"$name: 1x=$t1%.1fs 10x=$t10%.1fs ratio=$ratio%.1f")
    assert(ratio <= 25.0, f"$name grew superlinearly: 1x=$t1%.1fs 10x=$t10%.1fs")
  }

  test("q_dedup_cc at 10x: per-replica structure, hot cluster closes, linear") {
    import spark.implicits._
    val (d1, d10) = dirs
    val c1 = SparkEntry.queries("q_dedup_cc")(spark, d1)
      .agg(countDistinct($"cluster_id")).head.getLong(0)
    val out10 = SparkEntry.queries("q_dedup_cc")(spark, d10)
    val c10 = out10.agg(countDistinct($"cluster_id")).head.getLong(0)
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
    assertLinear("q_dedup_cc")
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
      .agg(sum($"n_docs")).head.getLong(0)
    val a10 = SparkEntry.queries("q_pipeline_corpus2")(spark, d10)
      .agg(sum($"n_docs")).head.getLong(0)
    // same 2% corridor as the cc count: the keep decision rides the
    // banding-sensitive closure
    val want = Replicas * a1 + 1
    assert(math.abs(a10 - want) <= want / 50,
      s"expected ~$want kept docs at 10x (2% corridor), got $a10 (1x keeps $a1)")
    assertLinear("q_pipeline_corpus2")
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
    assertLinear("q_join_fuzzy")
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
    assertLinear("q_index_inverted")
  }
}
