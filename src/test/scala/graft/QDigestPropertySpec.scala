package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expr.QDigest

/** ∀-grade gate on the q-digest ([[graft.expr.QDigest]]): QDigestSpec
  * proves the bound and the merge invariants on fixed adversarial
  * corpora; this closes the ∀ gap over GENERATED multisets — skewed
  * duplicates, tiny and large k, out-of-universe values — with the same
  * three properties a 100 TB rollup actually leans on:
  *
  *  1. rank-error bound: every estimate's true rank bracket lies within
  *     LogU·(n/k+1) of the target rank (the documented guarantee, not a
  *     loosened test-only corridor);
  *  2. merge-order bit-invariance: digests of any partition of the
  *     multiset, summed in shuffled vs sorted order, serialize to
  *     identical bytes (what makes a multi-executor shuffle safe);
  *  3. merged-path bound: the union of per-part digests re-estimates
  *     within the two-compression envelope LogU·(2n/k + parts + 1).
  */
class QDigestPropertySpec extends SparkSpec {

  private def buildBytes(vals: Seq[Long], k: Int): Array[Byte] =
    QDigest.serialize(vals.foldLeft(Map.empty[Long, Long])(QDigest.add), k)

  private def rankOf(vals: Seq[Long], x: Long): Long =
    vals.count(QDigest.clamp(_) <= x).toLong

  test("rank bound, merge bit-invariance, and merged-path bound on 60 generated multisets") {
    // values deliberately straddle the universe edge (clamping path) and
    // repeat heavily (duplicate-mass compression path)
    val value = Gen.frequency(
      5 -> Gen.choose(0L, 2000L),
      3 -> Gen.const(777L), // hot spike
      1 -> Gen.choose(QDigest.U - 10L, QDigest.U + 100L))
    val gen = for {
      n <- Gen.choose(200, 5000)
      k <- Gen.oneOf(8, 32, 256, 4096)
      vals <- Gen.listOfN(n, value)
    } yield (k, vals)
    val cases = Gen.listOfN(60, gen)
      .pureApply(Gen.Parameters.default, Seed(101L))

    cases.foreach { case (k, vals) =>
      val n = vals.size
      val sk = buildBytes(vals, k)
      val bound = QDigest.LogU.toLong * (n.toLong / k + 1)
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val est = QDigest.quantile(sk, q)
        val target = math.ceil(q * n).toLong
        assert(rankOf(vals, est) >= target - bound,
          s"k=$k n=$n q=$q est=$est too low")
        assert(rankOf(vals, est - 1) <= target + bound,
          s"k=$k n=$n q=$q est=$est too high")
      }

      // partition into 1..6 parts deterministically, merge both orders
      val parts = vals.zipWithIndex
        .groupBy { case (_, i) => i % (1 + (n % 6)) }
        .toSeq
        .sortBy(_._1)
        .map { case (_, vs) => buildBytes(vs.map(_._1), k) }
      def mergeAll(ps: Seq[Array[Byte]]): Array[Byte] =
        QDigest.serialize(
          ps.map(QDigest.deserialize)
            .foldLeft(Map.empty[Long, Long])(QDigest.sum),
          k)
      val a = mergeAll(parts)
      val b = mergeAll(parts.reverse)
      assert(java.util.Arrays.equals(a, b), s"k=$k n=$n merge order changed bytes")

      val mBound = QDigest.LogU.toLong * (2L * n / k + parts.size + 1)
      for (q <- Seq(0.5, 0.9)) {
        val est = QDigest.quantile(a, q)
        val target = math.ceil(q * n).toLong
        assert(rankOf(vals, est) >= target - mBound,
          s"k=$k n=$n q=$q merged est=$est too low")
        assert(rankOf(vals, est - 1) <= target + mBound,
          s"k=$k n=$n q=$q merged est=$est too high")
      }
    }
  }
}
