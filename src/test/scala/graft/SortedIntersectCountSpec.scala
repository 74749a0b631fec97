package graft

import graft.expr.SortedIntersectCount
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The custom expression must agree with size(array_intersect) on distinct
  * sorted inputs, in BOTH the codegen and interpreted paths.
  */
class SortedIntersectCountSpec extends SparkSpec {

  private def pairs: Seq[(Seq[Long], Seq[Long])] = {
    val arr = Gen.listOf(Gen.choose(0L, 50L)).map(_.distinct.sorted)
    Gen
      .listOfN(100, Gen.zip(arr, arr))
      .pureApply(Gen.Parameters.default, Seed(7L))
  }

  test("agrees with size(array_intersect) on random sorted distinct arrays") {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val got = df
      .select(
        SortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("interpreted path (eval) matches codegen result") {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    // force the interpreted path by disabling whole-stage codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df
        .select(SortedIntersectCount(col("a"), col("b")).as("c"))
        .collect()
        .map(_.getInt(0))
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val codegen = df
        .select(SortedIntersectCount(col("a"), col("b")).as("c"))
        .collect()
        .map(_.getInt(0))
      assert(interp.toSeq == codegen.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null arrays yield null; empty arrays yield 0") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq.empty[Long]), Some(Seq(1L, 2L)))).toDF("a", "b")
    val rows = df.select(SortedIntersectCount(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getInt(0) == 0)
  }
}
