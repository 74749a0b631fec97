package graft

import graft.ops.{DedupOps, Hashing}

/** The one untested 100 TB risk in the dedup family: a HOT band bucket
  * (thousands of near-identical documents hash to one LSH band value, so
  * one shuffle partition holds a quadratic verify workload). The banded
  * join is a shuffle join precisely so AQE can skew-split it — this spec
  * synthesizes the hot bucket and asserts the split actually happens,
  * with the pair output unchanged under the split.
  */
class SkewSpec extends SparkSpec {

  test("hot band bucket is AQE skew-split in the banded Jaccard join") {
    import spark.implicits._
    // 600 near-identical docs (the pathological corpus: one boilerplate
    // page crawled 600 times with a one-token footer change). Every doc =
    // 40 shared tokens + 1 unique token chosen to be minhash-neutral
    // (larger than the shared minimum under every hash lane), so all 600
    // collide in every band bucket while the rows stay incompressible
    // enough for byte-based skew detection to see the hot partition.
    val shared = (0 until 40).map(k => 13L * k + 3).sorted
    val sharedMin = (0 until Hashing.NumHashes).map(j =>
      shared.map(h => Math.floorMod(Hashing.mhA(j) * h + Hashing.mhB(j), Hashing.P)).min)
    val extras = Iterator
      .iterate(1000L)(_ + 1)
      .filter(x =>
        (0 until Hashing.NumHashes).forall(j =>
          Math.floorMod(Hashing.mhA(j) * x + Hashing.mhB(j), Hashing.P) > sharedMin(j)))
      .take(600)
      .toSeq
    val hot = extras.zipWithIndex.map { case (x, i) =>
      (i.toLong, "en", (shared :+ x).sorted)
    }
    val cold = (0 until 100).map { i =>
      (10000L + i, "en", Seq(7L * i + 2, 7L * i + 3, 7L * i + 5).sorted)
    }
    val sets = (hot ++ cold)
      .toDF("doc_id", "lang", "th")
      .selectExpr("doc_id", "lang", "th", "size(th) AS n")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> conf.getOption(k))
    try {
      // production thresholds are MB-scale; scale them to a KB-scale corpus
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // the join feeds a distinct (its own exchange), so an extra shuffle
      // from splitting is already paid — force the split even so
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val df = DedupOps.bandedJaccardPairs(spark, sets, 9, 10)
      // collect THIS DataFrame (not count(), a different query tree) so the
      // adaptive plan below is the final executed one. Correctness under
      // the split: every hot pair shares 40 of 42 distinct tokens
      // (J = 40/42 ≈ 0.952 ≥ 0.9), so all C(600,2) pairs must survive
      assert(df.collect().length == 600 * 599 / 2)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-split marker in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  /** The 10× GROWTH shape of the same pathology (verdict-r15 #5): a
    * templated-boilerplate flood whose hot band bucket grows with the
    * corpus — near-identical but NOT identical docs, so exact-dup
    * collapse cannot quotient them and the bucket's C(k,2) verify
    * workload is inherent in the output. What must hold at 10×: the
    * candidate join emits EXACTLY the hot pairs (banding never leaks
    * cold docs into the bucket, so work tracks output size), and the
    * wall ratio stays near the pair-count ratio — an all-pairs or
    * unsplit-bucket regression shows up as superlinear wall growth on
    * top of a contaminated pair count.
    */
  test("templated flood at 10x pairs: output exactly the hot pairs, wall tracks pairs") {
    import spark.implicits._
    val shared = (0 until 40).map(k => 13L * k + 3).sorted
    val sharedMin = (0 until Hashing.NumHashes).map(j =>
      shared.map(h => Math.floorMod(Hashing.mhA(j) * h + Hashing.mhB(j), Hashing.P)).min)
    val neutral = Iterator
      .iterate(1000L)(_ + 1)
      .filter(x =>
        (0 until Hashing.NumHashes).forall(j =>
          Math.floorMod(Hashing.mhA(j) * x + Hashing.mhB(j), Hashing.P) > sharedMin(j)))

    def flood(nHot: Int, nCold: Int) = {
      val hot = neutral.take(nHot).toSeq.zipWithIndex.map { case (x, i) =>
        (i.toLong, "en", (shared :+ x).sorted)
      }
      val cold = (0 until nCold).map { i =>
        (1000000L + i, "en", Seq(7L * i + 2, 7L * i + 3, 7L * i + 5).sorted)
      }
      (hot ++ cold)
        .toDF("doc_id", "lang", "th")
        .selectExpr("doc_id", "lang", "th", "size(th) AS n")
        .localCheckpoint(true) // time the pair join, not the row synth
    }

    def timePairs(nHot: Int, nCold: Int): Double = {
      val sets = flood(nHot, nCold)
      val t0 = System.nanoTime()
      val pairs = DedupOps.bandedJaccardPairs(spark, sets, 9, 10).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      // exactness: the flood's pairs and ONLY the flood's pairs — every
      // id below the cold base, i.e. no cold doc ever entered the bucket
      assert(pairs.length == nHot * (nHot - 1) / 2,
        s"expected C($nHot,2) pairs, got ${pairs.length}")
      assert(pairs.forall(r => r.getLong(0) < 1000000L && r.getLong(1) < 1000000L))
      wall
    }

    // warm the pair-join codegen so t1 isn't charged JIT the t10 run skips
    timePairs(40, 100)
    // The HARD gate is the exactness assertions inside timePairs (an
    // all-pairs regression contaminates the pair count deterministically).
    // The wall ratio is a secondary envelope over sub-second timings, so
    // a host co-load window hitting only the 10× measurement can inflate
    // it spuriously (ADVICE r16) — measure up to 3 times and take the
    // best ratio: a REAL quadratic regression slows every attempt, while
    // a transient window doesn't recur across attempts.
    val ratio = (1 to 3).iterator.map { attempt =>
      val t1 = timePairs(190, 1000) // C(190,2)  = 17,955 pairs
      val t10 = timePairs(600, 10000) // C(600,2) = 179,700 pairs ≈ 10.01×
      val r = t10 / math.max(t1, 0.5)
      info(f"flood attempt $attempt: 1x=$t1%.2fs 10x=$t10%.2fs ratio=$r%.1f")
      r
    }.scanLeft(Double.MaxValue)(math.min).drop(1).find(_ <= 8.0)
      .getOrElse(Double.MaxValue)
    // pairs grow 10.0×, corpus 9.9×; fixed overhead dominates at these
    // absolute sizes (observed ratio ≈ 1.5 on sub-second walls). The
    // bound is ~5× observed — generous to host noise, far under the
    // ~100× an all-pairs candidate step would show, and low enough that
    // a serialized unsplit hot bucket's quadratic verify leg still trips
    assert(ratio <= 8.0,
      f"flood pair wall grew beyond the output envelope on every attempt (best ratio $ratio%.1f)")
  }

  /** The INCREMENTAL apply under the same pathology (verdict-r9 #7): a
    * boilerplate page dominates a daily batch — 500 exact copies collapse
    * onto ONE (lang, md5) key and 500 near variants (one extra footer
    * token each) collapse onto ONE band bucket, together ~87% of a
    * 1,150-doc batch. The apply must stay batch-sized (the md5 group
    * collapses to a single rep probe; each near rep verifies against the
    * ONE indexed boilerplate rep, so probe pairs = near reps, never
    * near × base), assign every boilerplate row to the persisted base
    * cluster, and the hot probe bucket must AQE-skew-split in
    * [[DedupOps.indexProbePairs]]'s shuffle join.
    */
  test("boilerplate batch vs persisted index: apply is batch-sized, probe bucket skew-splits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._

    def h32(t: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    def lanes(t: String): Seq[Long] =
      (0 until Hashing.NumHashes).map(j =>
        Math.floorMod(Hashing.mhA(j) * h32(t) + Hashing.mhB(j), Hashing.P))

    // the boilerplate page: 200 shared tokens; footer tokens are chosen
    // minhash-neutral in lanes 0-3 (band 0's rows), so all 500 near
    // variants share band 0's value with the base page — ONE
    // deterministic hot bucket — while at least one of lanes 4-7 drops
    // below the shared minima, scattering band 1. One hot key matters:
    // with two equally-hot keys on a 4-partition shuffle, the hot
    // partitions ARE the median and AQE's factor*median test can never
    // fire — the single-hot-bucket shape is both the realistic pathology
    // (one boilerplate page) and the detectable one. 200 shared tokens
    // (boilerplate pages are big): map-side lz4 dedups the shared token
    // arrays across the near-identical rows, so the hot bucket's
    // COMPRESSED map-output bytes — what MapStatus reports and the skew
    // detector reads — need a realistic page size to clear factor*median.
    val shared = (0 until 200).map(k => f"boiler$k%03d")
    val sharedMin = (0 until Hashing.NumHashes).map(j =>
      shared.map(t => lanes(t)(j)).min)
    val footers = Iterator
      .from(0)
      .map(i => s"uq$i")
      .filter { t =>
        val l = lanes(t)
        (0 until 4).forall(j => l(j) > sharedMin(j)) &&
        (4 until 8).exists(j => l(j) < sharedMin(j))
      }
      .take(500)
      .toSeq
    val boilerText = shared.mkString(" ")

    val base = ((0L, "en", boilerText) +:
      (1 to 400).map(i => (i.toLong, "en", s"g${i}a g${i}b g${i}c")))
      .toDF("doc_id", "lang", "text")
    val (md5Idx0, bandIdx0) = DedupOps.buildDedupIndex(spark, base)
    val md5Idx = md5Idx0.localCheckpoint(eager = true)
    val bandIdx = bandIdx0.localCheckpoint(eager = true)

    val exact = (0 until 500).map(i => (10000L + i, "en", boilerText))
    val near = footers.zipWithIndex.map { case (f, i) =>
      (20000L + i, "en", s"$boilerText $f")
    }
    val fresh = (0 until 150).map(i => (30000L + i, "en", s"f${i}a f${i}b f${i}c"))
    val batch = (exact ++ near ++ fresh).toDF("doc_id", "lang", "text")

    // batch-sized probe: one verified pair per near rep (the exact copies
    // never reach the band index — the md5 key catches them first). The
    // probe frame is what the apply actually probes — the md5-unmatched
    // reps, near AND fresh — so the shuffle's cold partitions carry the
    // background load the skew detector's median sees in production.
    val probeToks = DedupOps.hashedToksOf(
      (near ++ fresh).toDF("doc_id", "lang", "text"))
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val pairs = DedupOps.indexProbePairs(spark, probeToks, bandIdx)
      val rows = pairs.collect()
      assert(rows.length == 500,
        s"probe must yield ONE pair per near rep (batch-sized), got ${rows.length}")
      assert(rows.forall(_.getLong(1) == 0L), "every near rep attaches to cluster 0")
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
      def stages(p: SparkPlan): Seq[ShuffleQueryStageExec] = p match {
        case s: ShuffleQueryStageExec => s +: stages(s.plan)
        case q: QueryStageExec => stages(q.plan)
        case other => other.children.flatMap(stages)
      }
      val dbg = pairs.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec =>
          stages(a.executedPlan)
            .map(s => s"stage ${s.id}: ${s.mapStats.map(_.bytesByPartitionId.mkString(","))}")
            .mkString("; ")
        case _ => "not adaptive"
      }
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-split marker [$dbg] in probe plan:\n$plan")

      // full apply under the skewed batch: every boilerplate row lands in
      // the persisted base cluster, fresh rows form their own clusters
      val got = DedupOps
        .applyDedupDelta(spark, batch, md5Idx, bandIdx)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got.size == 1150)
      assert((0 until 500).forall(i => got(10000L + i) == 0L),
        "exact copies must ride the md5 index to cluster 0")
      assert((0 until 500).forall(i => got(20000L + i) == 0L),
        "near variants must ride the band index to cluster 0")
      assert((0 until 150).forall(i => got(30000L + i) == 30000L + i),
        "fresh docs must form singleton clusters")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
