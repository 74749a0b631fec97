package graft

import graft.expr.TopKAgg
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The mergeable top-k aggregator must equal the sort-take reference on
  * any input and any partitioning (merge associativity + bounded state).
  */
class TopKAggSpec extends SparkSpec {

  private val agg = new TopKAgg(3)

  private def ref(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(3)

  private def inputs: Seq[List[(Double, Long)]] =
    Gen
      .listOfN(
        60,
        Gen.listOf(Gen.zip(Gen.choose(-10.0, 10.0), Gen.choose(0L, 20L))))
      .pureApply(Gen.Parameters.default, Seed(23L))

  test("reduce-fold equals sort-take reference") {
    inputs.foreach { xs =>
      val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      assert(got == ref(xs), xs.toString)
    }
  }

  test("any split point merges to the same result (map-side partials are safe)") {
    inputs.filter(_.nonEmpty).foreach { xs =>
      val whole = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      (0 to xs.length by math.max(1, xs.length / 3)).foreach { cut =>
        val (l, r) = xs.splitAt(cut)
        val merged = agg.finish(
          agg.merge(
            l.foldLeft(agg.zero)(agg.reduce),
            r.foldLeft(agg.zero)(agg.reduce)))
        assert(merged == whole, s"cut=$cut $xs")
      }
    }
  }

  test("state never exceeds k") {
    inputs.foreach { xs =>
      assert(xs.foldLeft(agg.zero)(agg.reduce).length <= 3)
    }
  }
}
