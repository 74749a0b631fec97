package graft

import graft.ops.DedupOps

/** The embed-dedup twin of [[SkewSpec]]: a HOT sign-band bucket — a cluster
  * of near-identical embeddings all hashing to one LSH band value, the
  * realistic skew case for q_dedup_embed/_rh (one template image/passage
  * embedded thousands of times). The band bucket is the shuffle key of
  * [[DedupOps.bandedCandidates]] precisely so AQE can skew-split it; this
  * spec synthesizes the hot bucket and asserts the split happens with the
  * pair output unchanged.
  */
class EmbedSkewSpec extends SparkSpec {

  test("hot sign-band bucket is AQE skew-split in the embed band join") {
    import spark.implicits._
    // 600 vectors near-identical on band 0's sampled dims (all positive →
    // band_val 255), spread across bands 1-3 (values 120..222 keyed by
    // vec_id) — ONE hot bucket, so its shuffle partition dwarfs the median
    // (a cluster split over several hot keys can land one key per
    // partition and defeat factor-based detection).
    def signs(d: Int, bits: Int): Float = {
      val k = (d / 2) % 8
      if (((bits >> k) & 1) == 1) 1f else -1f
    }
    val hot = (0 until 600).map { i =>
      (i.toLong, Array.tabulate(64) { d =>
        if (d % 2 == 0) { // sampled dims are the 0-based even indices
          if (d < 16) 0.5f else signs(d, 120 + i % 103)
        } else 0.25f + 0.001f * ((i + d) % 7)
      })
    }
    // 100 cold vectors, each encoding its own id (1..100 — disjoint from
    // 255 and 120..222) in every band's sign bits, so no cold/cold or
    // cold/hot pair ever shares a bucket: expected pairs = C(600,2).
    val cold = (0 until 100).map { i =>
      (10000L + i, Array.tabulate(64) { d =>
        if (d % 2 == 0) signs(d, i + 1) else 0.25f
      })
    }
    val emb = (hot ++ cold).toDF("vec_id", "embedding")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.getOption(k))
    try {
      // production thresholds are MB-scale; the exploded band rows are three
      // longs each and compress hard, so scale thresholds to the compressed
      // byte sizes this corpus actually produces
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // the join feeds a distinct (its own exchange), so an extra shuffle
      // from splitting is already paid — force the split even so
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // at test scale the band table fits the broadcast threshold; at the
      // scale this guards it is corpus-sized, so force the shuffle join
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // skew detection is max-vs-median ACROSS partitions: with the suite's
      // 4 shuffle partitions the uniform band traffic alone makes every
      // partition ~median-sized and the hot bucket never reaches 2×; with
      // 64 the median partition is thin and the hot bucket towers over it
      conf.set("spark.sql.shuffle.partitions", "64")
      val df = DedupOps.embBandedCandidates(emb)
      // collect THIS DataFrame (not count(), a different query tree) so the
      // adaptive plan below is the final executed one
      assert(df.collect().length == 600 * 599 / 2)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-split marker in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
