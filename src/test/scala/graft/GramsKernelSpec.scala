package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The r18 fused gram emitters must agree BIT-FOR-BIT with the composed
  * HOF chains they replaced — [[graft.expr.Grams]] vs
  * `transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(tk, i, k)))`
  * and [[graft.expr.GramMd5Hex]] vs the same chain under
  * `md5(array_join(...))` — on the real corpus and on adversarial token
  * arrays (empty strings, single token, exactly-k tokens, repeated
  * separators producing empty tokens). The oracle SQL of the passage /
  * boilerplate / passage-cc families is unchanged, so kernel ≡ chain is
  * exactly the property that keeps those queries hash-green.
  */
class GramsKernelSpec extends SparkSpec {

  private def composedGrams(k: Int) = expr(
    s"transform(sequence(1, size(tk) - ${k - 1}), " +
      s"i -> concat_ws(' ', slice(tk, i, $k)))")

  private def composedMd5(k: Int) = expr(
    s"transform(sequence(1, size(tk) - ${k - 1}), " +
      s"i -> md5(array_join(slice(tk, i, $k), ' ')))")

  private def toks(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.select($"doc_id", split($"text", " ").as("tk"))
  }

  private def adversarial: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f"),
      (2L, "exactly five tokens right here"),
      (3L, "one two three four five"),
      (4L, "a  b   c d e"), // repeated separators -> empty tokens
      (5L, "solo"),
      (6L, ""),
      (7L, (1 to 120).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
  }

  private def assertAgree(df: DataFrame, fused: org.apache.spark.sql.Column,
      composed: org.apache.spark.sql.Column, minTk: Int): Unit = {
    import df.sparkSession.implicits._
    val bad = df
      .filter(size($"tk") >= minTk)
      .select($"doc_id", fused.as("f"), composed.as("c"))
      .filter(!($"f" <=> $"c"))
      .count()
    assert(bad == 0L, "fused kernel diverges from the composed HOF chain")
  }

  test("Grams(k=5) == composed concat_ws chain on the corpus + adversarial") {
    import spark.implicits._
    val corpus = toks(graft.T(spark, sf, "documents"))
    assertAgree(corpus, graft.expr.Grams($"tk", 5), composedGrams(5), 5)
    assertAgree(toks(adversarial.filter($"doc_id" =!= 6L)),
      graft.expr.Grams($"tk", 5), composedGrams(5), 5)
  }

  test("Grams(k=3) == composed chain (boilerplate shingles)") {
    import spark.implicits._
    val corpus = toks(graft.T(spark, sf, "documents"))
    assertAgree(corpus, graft.expr.Grams($"tk", 3), composedGrams(3), 3)
  }

  test("GramMd5Hex(k=50) == composed md5(array_join) chain") {
    import spark.implicits._
    val corpus = toks(graft.T(spark, sf, "documents"))
    assertAgree(corpus, graft.expr.GramMd5Hex($"tk", 50), composedMd5(50), 50)
    assertAgree(toks(adversarial), graft.expr.GramMd5Hex($"tk", 2), composedMd5(2), 2)
  }

  test("Bm25Tokens == composed lower/split/rlike chain, corpus + adversarial") {
    import spark.implicits._
    val cases = graft.T(spark, sf, "documents").select($"doc_id", $"text")
      .unionByName(Seq(
        (1001L, "MiXeD CaSe TOKENS ab abc a1b2c3"),
        (1002L, "punct, and; short a bb ccc  double  spaces"),
        (1003L, ""),
        (1004L, "ümlaut Straße KKelvin 123 4567 ok_ok")).toDF("doc_id", "text"))
    val fusedT = cases.select($"doc_id",
      explode(graft.expr.Bm25Tokens($"text")).as("term"))
    val composedT = cases
      .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      .filter($"term".rlike("^[a-z0-9]{3,}$"))
    assert(fusedT.exceptAll(composedT).count() == 0L)
    assert(composedT.exceptAll(fusedT).count() == 0L)
  }

  test("below-k input yields an empty array (composed form's filtered domain)") {
    import spark.implicits._
    val rows = toks(adversarial.filter($"doc_id".isin(5L, 6L)))
      .select(size(graft.expr.Grams($"tk", 5)).as("n5"),
        size(graft.expr.GramMd5Hex($"tk", 50)).as("n50"))
      .collect()
    assert(rows.forall(r => r.getInt(0) == 0 && r.getInt(1) == 0))
  }
}
