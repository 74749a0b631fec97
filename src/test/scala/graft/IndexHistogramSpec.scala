package graft

import org.apache.spark.sql.functions._

/** Row-level invariants of q_index_inverted, q_agg_histogram and
  * q_sample_weighted beyond the oracle hash: exact df against an
  * independent recompute, bucket geometry/coverage, and the weighted
  * sample's determinism + threshold honesty.
  */
class IndexHistogramSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("inverted index df is exact and postings are a sorted bounded prefix") {
    import spark.implicits._
    val out = q("q_index_inverted").cache()
    // independent df recompute from the raw corpus
    val truth = T(spark, sf, "documents")
      .select($"doc_id",
        explode(array_distinct(split(lower($"text"), " "))).as("token"))
      .filter($"token".rlike("^[a-z0-9]{3,}$"))
      .groupBy($"token").agg(count(lit(1)).as("true_df"))
    assert(out.join(truth, "token").filter($"df" =!= $"true_df").count() == 0)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.length <= 20 && ids.length.toLong <= r.getAs[Long]("df"))
      assert(ids.sameElements(ids.sorted)) // lexicographically-first sample
      // a capped list means df really exceeded the cap
      if (ids.length < 20) assert(r.getAs[Long]("df") == ids.length)
    }
    out.unpersist()
  }

  test("histogram buckets cover every order exactly once with true geometry") {
    import spark.implicits._
    val out = q("q_agg_histogram").collect()
    assert(out.map(_.getAs[Long]("n")).sum == T(spark, sf, "orders").count())
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b < 20)
      assert(r.getAs[Double]("bucket_lo") == b * 25000.0)
    }
    // recount one bucket independently
    val b3 = T(spark, sf, "orders")
      .filter($"o_totalprice" >= 75000.0 && $"o_totalprice" < 100000.0)
      .count()
    assert(out.find(_.getAs[Long]("bucket") == 3L).map(_.getAs[Long]("n")).contains(b3))
  }

  test("exact-moment correlation agrees with Spark's native corr") {
    import spark.implicits._
    val out = q("q_stat_corr").collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("corr_qty_price"))
      .toMap
    val native = T(spark, sf, "lineitem")
      .groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("c"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("c"))
      .toMap
    assert(out.keySet == native.keySet && out.nonEmpty)
    // the exact-moment formula and the streaming co-moment path agree to
    // float tolerance; only the former is bit-stable cross-engine
    out.foreach { case (k, v) =>
      assert(math.abs(v - native(k)) < 1e-9, s"$k: $v vs ${native(k)}")
      assert(v >= -1.0 && v <= 1.0)
    }
  }

  test("chi-square cells reconcile with their marginals") {
    import spark.implicits._
    val out = q("q_stat_chisq").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Double]("contribution") >= 0.0))
    val grand = out.map(_.getAs[Long]("obs")).sum.toDouble
    // expected-under-independence sums back to the observed marginals
    out.groupBy(_.getAs[String]("event_type")).foreach { case (_, rows) =>
      val rowN = rows.map(_.getAs[Long]("obs")).sum.toDouble
      assert(math.abs(rows.map(_.getAs[Double]("expected")).sum - rowN) < 1e-6)
    }
    out.groupBy(_.getAs[Int]("dow")).foreach { case (dow, rows) =>
      assert(dow >= 0 && dow <= 6)
      val colN = rows.map(_.getAs[Long]("obs")).sum.toDouble
      assert(math.abs(rows.map(_.getAs[Double]("expected")).sum - colN) < 1e-6)
    }
    assert(math.abs(out.map(_.getAs[Double]("expected")).sum - grand) < 1e-6)
  }

  test("weighted sample is deterministic and honors its own threshold") {
    import spark.implicits._
    val out = q("q_sample_weighted").cache()
    // rerun selects the identical set (pure function of the key)
    assert(out.except(q("q_sample_weighted")).count() == 0)
    // long docs clip to weight 1.0 and are therefore all kept
    val total = T(spark, sf, "documents")
    val clippedIn = total.filter($"n_chars" * 25 >= 10000).count()
    assert(out.filter($"keep_weight" === 1.0).count() == clippedIn)
    // fractional weights thin the set: strictly fewer than the input
    assert(out.count() < total.count())
    // reported weight is the advertised function of n_chars
    assert(out
      .filter($"keep_weight" =!=
        least(lit(10000L), $"n_chars" * 25).cast("double") / 10000.0)
      .count() == 0)
    out.unpersist()
  }
}
