package graft

import graft.expr.LenientJson
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The native LenientJsonParse expression (round 4; replaced the Scala UDF
  * fallback) must agree with the reference parseToMap function in both the
  * codegen and interpreted paths, including the null/garbage→{} totality
  * contract the reference's safe_parse_passback has
  * (/root/reference/main.py:94-101).
  */
class LenientJsonParseExprSpec extends SparkSpec {

  private def inputs: Seq[String] =
    Seq(
      null,
      "",
      "   ",
      """{"a": 1, "b": "x"}""",
      "{'a': True, 'b': None, 'c': 'x'}",
      "{'lis_result_sourcedid': '12:34'}",
      "not json at all",
      "[1, 2, 3]",
      "{'unclosed': ") ++
      Gen
        .listOfN(60, Gen.asciiPrintableStr)
        .pureApply(Gen.Parameters.default, Seed(17L))

  private def viaExpr(wholeStage: Boolean): Seq[Map[String, String]] = {
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
    spark.conf
      .set("spark.sql.codegen.factoryMode", if (wholeStage) "FALLBACK" else "NO_CODEGEN")
    try {
      inputs
        .toDF("s")
        .select(LenientJson.lenient(col("s")).as("m"))
        .as[Map[String, String]]
        .collect()
        .toSeq
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("codegen and interpreted paths both equal parseToMap, row for row") {
    val expected = inputs.map(LenientJson.parseToMap)
    assert(viaExpr(wholeStage = true) == expected)
    assert(viaExpr(wholeStage = false) == expected)
  }

  test("q_parse_literal runs the parse inside whole-stage codegen (no UDF split)") {
    // a literal local relation constant-folds away, so assert on the real
    // query plan over the parquet source (the path the driver times);
    // execute first — under AQE the pre-execution plan shows no
    // WholeStageCodegen nodes regardless of eligibility
    val df = SparkEntry.queries("q_parse_literal")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("UDF"), p)
    // the executed plan renders a WholeStageCodegen span as a `*(n)` prefix
    // on its member nodes: the parse projection must carry one
    val finalPlan = p.split("== Initial Plan ==").head
    val parseLines =
      finalPlan.linesIterator.filter(_.contains("lenient_json_parse")).toSeq
    assert(parseLines.nonEmpty, p)
    assert(parseLines.forall(_.matches(""".*\*\(\d+\) Project .*""")), p)
  }
}
