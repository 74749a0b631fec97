package graft

import graft.expr.DotProduct
import graft.ops.Vec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The fused kernel must be BIT-identical to the higher-order
  * zip_with+aggregate left fold it replaces (that fold is what the DuckDB
  * oracle mirrors), in both the codegen and interpreted paths.
  */
class DotProductSpec extends SparkSpec {

  private def pairs: Seq[(Seq[Float], Seq[Float])] = {
    val arr = Gen.listOfN(64, Gen.choose(-4.0f, 4.0f))
    Gen
      .listOfN(100, Gen.zip(arr, arr))
      .pureApply(Gen.Parameters.default, Seed(11L))
  }

  test("bit-identical to the zip_with+aggregate left fold") {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    val got = df
      .select(
        DotProduct(col("a"), col("b")).as("fast"),
        Vec.dotHof(col("a"), col("b")).as("ref"))
      .collect()
    got.foreach { r =>
      assert(
        java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        r.toString)
    }
  }

  test("interpreted path (eval) matches codegen result") {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df
        .select(DotProduct(col("a"), col("b")).as("c"))
        .collect()
        .map(_.getDouble(0))
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val codegen = df
        .select(DotProduct(col("a"), col("b")).as("c"))
        .collect()
        .map(_.getDouble(0))
      assert(
        interp.map(java.lang.Double.doubleToRawLongBits).toSeq ==
          codegen.map(java.lang.Double.doubleToRawLongBits).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null array yields null; mismatched lengths yield null (zip_with pad)") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), None: Option[Seq[Float]]),
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float]))).toDF("a", "b")
    val rows = df
      .select(
        DotProduct(col("a"), col("b")).as("fast"),
        Vec.dotHof(col("a"), col("b")).as("ref"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getDouble(0) == 0d && rows(2).getDouble(1) == 0d)
  }
}
