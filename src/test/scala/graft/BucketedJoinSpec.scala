package graft

import org.apache.spark.sql.functions._

/** Bucketing is the co-located-join tool at 100 TB: both fact tables
  * written `bucketBy(n, key)` share a partitioning on disk, so the
  * documents×embeddings join — the q_multimodal shape, re-run constantly
  * in a training pipeline — needs NO Exchange on either side and no sort
  * (bucket files are sortBy-ordered). This spec writes both tables
  * bucketed, joins them with broadcast disabled (forcing the shuffle-join
  * strategy bucketing exists to neutralize), and asserts the executed plan
  * is exchange-free with the result unchanged.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed documents × embeddings join runs with zero exchanges") {
    // a dedicated database with an explicit /tmp location keeps the
    // managed bucketed tables out of the repo's working directory
    spark.sql(
      "CREATE DATABASE IF NOT EXISTS graft_bt LOCATION '/tmp/graft_bt_wh'")
    val conf = spark.conf
    val savedBroadcast = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      graft
        .T(spark, sf, "documents")
        .write
        .mode("overwrite")
        .bucketBy(8, "doc_id")
        .sortBy("doc_id")
        .saveAsTable("graft_bt.docs_b")
      graft
        .T(spark, sf, "embeddings")
        .write
        .mode("overwrite")
        .bucketBy(8, "vec_id")
        .sortBy("vec_id")
        .saveAsTable("graft_bt.emb_b")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark
        .table("graft_bt.docs_b")
        .join(spark.table("graft_bt.emb_b"), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("label"))
      val rows = j.collect()
      // same result as the unbucketed join…
      val expected = graft
        .T(spark, sf, "documents")
        .join(graft.T(spark, sf, "embeddings"), col("doc_id") === col("vec_id"))
        .count()
      assert(rows.length.toLong == expected && expected > 0)
      // …from a plan where the bucket layout replaced both shuffles
      val p = j.queryExecution.executedPlan.toString
      assert(
        p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        p)
      assert(!p.contains("Exchange"), s"bucketed join still exchanged:\n$p")
      assert(p.contains("SelectedBucketsCount"), p)
    } finally {
      savedBroadcast match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.sql("DROP DATABASE IF EXISTS graft_bt CASCADE")
    }
  }
}
