package graft

import graft.ops.DedupOps

/** Candidate-recall validation for the sign-LSH embed banding (the
  * approximate half of q_dedup_embed; the exact-cosine verify half is
  * oracle-checked by the driver). Also pins the round-3 band widening:
  * bits are strided over all 64 dims, so similarity that lives only in
  * the upper half of the vector is still discoverable — under the old
  * dims-1..32 banding the second test's pair was invisible.
  */
class EmbedBandSpec extends SparkSpec {

  private def candidates(rows: Seq[(Long, Seq[Float])]): Set[(Long, Long)] = {
    import spark.implicits._
    DedupOps
      .embBandedCandidates(rows.toDF("vec_id", "embedding"))
      .as[(Long, Long)]
      .collect()
      .toSet
  }

  test("banded candidates capture planted near-duplicates (recall >= 0.9)") {
    val rnd = new scala.util.Random(42) // fixed seed: fully deterministic
    val base = (0 until 40).map(i => i.toLong -> Seq.fill(64)(rnd.nextGaussian().toFloat))
    val dups = (0 until 20).map { i =>
      (1000L + i) -> base(i)._2.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
    }
    val cand = candidates(base ++ dups)
    val found = (0 until 20).count(i => cand.contains((i.toLong, 1000L + i)))
    assert(found >= 18, s"recall ${found / 20.0} < 0.9 for cos≈0.999 pairs")
  }

  test("bands sample the upper dims: upper-half-only similarity is found") {
    // signs disagree on every dim 1..32 and agree on every dim 33..64:
    // banding confined to the first half would never emit this pair
    val a = 0L -> Seq.fill(64)(1f)
    val b = 1L -> (Seq.fill(32)(-1f) ++ Seq.fill(32)(1f))
    assert(candidates(Seq(a, b)).contains((0L, 1L)))
  }
}
