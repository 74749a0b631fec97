package graft

import java.nio.file.Files

import graft.ops.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q_dedup_embed_incr — the vector-modality incremental dedup: a new
  * batch's cos ≥ 0.4 pairs against base ∪ batch, computed from the
  * persisted band index alone, must equal the full q_dedup_embed pair set
  * restricted to pairs whose larger id is in the batch (exact — pair
  * contract, no closure, no recall corridor: both sides apply the same
  * banded candidate rule). Planted vectors exercise both apply legs and
  * the parquet round trip covers the persisted form.
  */
class EmbedIncrSpec extends SparkSpec {

  private val Dim = 64

  /** Deterministic unit-ish vector: base direction d with a small index
    * perturbation — vectors sharing d are near (cos ≈ 1), different d are
    * far (random-ish signs → cos ≈ 0).
    */
  private def vec(d: Int, jitter: Int): Seq[Float] =
    (0 until Dim).map { i =>
      val base = math.sin(d * 37.0 + i * 1.7)
      (base + 0.001 * jitter * math.cos(i * 2.3)).toFloat
    }

  private def frame(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private lazy val base = frame(Seq(
    0L -> vec(1, 0), // direction A
    1L -> vec(2, 0), // direction B
    2L -> vec(3, 0))) // direction C (unpaired)

  private lazy val delta = frame(Seq(
    100L -> vec(1, 1), // near base 0: the index-probe leg
    101L -> vec(2, 1), // near base 1: second probe pair
    102L -> vec(4, 0), // fresh direction D
    103L -> vec(4, 1), // near 102: the batch-internal leg
    104L -> vec(5, 0))) // fresh, unpaired

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("delta-apply equals the full rebuild restricted to batch pairs") {
    import spark.implicits._
    val all = base.unionByName(delta)
    val full = DedupOps.verifyCosinePairsFrom(
      all.select($"vec_id", $"embedding", graft.ops.Vec.norm2($"embedding").as("n2")),
      DedupOps.embBandedCandidates(all))
    val wantDelta = pairs(full).filter(_._2 >= 100L)
    val got = pairs(DedupOps.applyEmbedDelta(spark, delta, DedupOps.buildEmbedIndex(spark, base)))
    assert(got === wantDelta)
    // both legs fired:
    assert(got.contains((0L, 100L)) && got.contains((1L, 101L)), s"index-probe leg: $got")
    assert(got.contains((102L, 103L)), s"batch-internal leg: $got")
    // (direction C lands near D at cos ≈ 0.4 with these synthetic
    // vectors — present in BOTH sides, so equality covers it; only
    // direction E is genuinely far from everything)
    assert(!got.exists(p => p._1 == 104L || p._2 == 104L), s"unpaired stayed unpaired: $got")
  }

  test("apply from the parquet-persisted band index reproduces the in-memory apply") {
    val dir = Files.createTempDirectory("graft_embed_index").toString
    val idx = DedupOps.buildEmbedIndex(spark, base)
    val inMem = pairs(DedupOps.applyEmbedDelta(spark, delta, idx))
    idx.write.mode("overwrite").partitionBy("band_idx").parquet(dir)
    val back = spark.read.parquet(dir)
      .select("vec_id", "embedding", "n2", "band_idx", "band_val")
    assert(pairs(DedupOps.applyEmbedDelta(spark, delta, back)) === inMem)
    assert(inMem.nonEmpty)
  }

  test("q_dedup_embed_incr on testdata equals q_dedup_embed's batch slice") {
    import spark.implicits._
    val thr = T(spark, sf, "embeddings")
      .agg(expr("max(vec_id) div 2")).head().getLong(0)
    val full = SparkEntry.queries("q_dedup_embed")(spark, sf)
      .filter($"b_id" > thr)
    assert(pairs(SparkEntry.queries("q_dedup_embed_incr")(spark, sf)) === pairs(full))
  }
}
