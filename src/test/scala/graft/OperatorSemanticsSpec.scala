package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Row-level semantics of the Tier A operators, mirroring the reference's
  * behavior on hand-checkable data (SURVEY §5.2-2), plus cross-query
  * invariants on sf0.001.
  */
class OperatorSemanticsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_cast_bool is tri-state like main.py:142-145") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double])](
      (1L, None),
      (2L, Some(0d)),
      (3L, Some(2.5d))).toDF("event_id", "value")
    val out = df
      .select(when($"value".isNotNull, $"value" =!= lit(0d)).as("is_correct"))
      .collect()
    assert(out(0).isNullAt(0)) // None → NULL, not false
    assert(out(1).getBoolean(0) == false)
    assert(out(2).getBoolean(0) == true)
  }

  test("q_win_range frame is time-bounded, inclusive, and tie-complete") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, 0L),                  // t0
      (2L, 3600L * 1000000),     // +1h
      (3L, 25L * 3600 * 1000000), // +25h: t0 has aged out, +1h is exactly
      (4L, 25L * 3600 * 1000000)) // on the 24h bound (inclusive) + a tie
      .toDF("event_id", "tus")
    val w = Window.orderBy($"tus").rangeBetween(-86400000000L, 0)
    val out = df
      .select($"event_id", count(lit(1)).over(w).as("n"))
      .orderBy($"event_id")
      .collect()
      .map(_.getAs[Long]("n"))
    // +25h frame = [+1h, +25h]: the +1h row (inclusive bound), both tied
    // rows (RANGE peers always co-frame), not t0
    assert(out.toSeq == Seq(1L, 2L, 3L, 3L))
  }

  test("q_agg_listagg renders sorted distinct types, partition-invariantly") {
    import spark.implicits._
    val out = q("q_agg_listagg").cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val types = r.getAs[String]("types_used").split(",")
      assert(types.toSeq == types.sorted.toSeq) // rendered order is total
      assert(types.distinct.length == types.length)
      assert(types.length.toLong == r.getAs[Long]("n_types"))
    }
    // partition-invariance: a different physical layout renders identically
    val repartitioned = T(spark, sf, "events")
      .repartition(7)
      .groupBy($"user_id")
      .agg(array_join(sort_array(collect_set($"event_type")), ",").as("types_used"))
    assert(out.select($"user_id", $"types_used")
      .except(repartitioned).count() == 0)
    out.unpersist()
  }

  test("q_filter_valid + q_filter_rejects partition the input exactly") {
    val total = q("q_src_scan").count()
    assert(q("q_filter_valid").count() + q("q_filter_rejects").count() == total)
  }

  test("q_dedup_key keeps the first writer per (user_id, ts)") {
    val out = q("q_dedup_key")
    // no key appears twice afterwards
    assert(out.groupBy("user_id", "ts").count().filter(col("count") > 1).count() == 0)
    // survivor is the minimal event_id of its key group
    val src = q("q_src_scan")
    val mins = src.groupBy("user_id", "ts").agg(min("event_id").as("event_id"))
    assert(out.select("event_id").except(mins.select("event_id")).count() == 0)
  }

  test("q_agg_daily percentage is consistent with its own counts") {
    val r = q("q_agg_daily").collect().head
    val total = r.getAs[Long]("total_attempts")
    val succ = r.getAs[Long]("successful_attempts")
    val pct = r.getAs[Double]("success_percentage")
    assert(total > 0)
    assert(math.abs(pct - succ * 100.0 / total) < 0.01)
  }

  test("q_zero_fallback emits the zero-day report (main.py:293-315)") {
    val r = q("q_zero_fallback").collect().head
    assert(r.getAs[Long]("total_attempts") == 0L)
    assert(r.getAs[String]("success_percentage") == "0.00%")
    assert(r.getAs[Long]("unique_users") == 0L)
  }

  test("q_report_unpivot is the 7-metric grid, stringified (main.py:324-333)") {
    val rows = q("q_report_unpivot").collect()
    assert(rows.length == 7)
    assert(rows.forall(_.schema.fieldNames.sameElements(Array("metric", "value"))))
    val m = rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("report_date") == T.AsOf)
    assert(m("success_percentage").endsWith("%"))
  }

  test("q_window_7d spans exactly the trailing window") {
    val out = SparkEntry.queries("q_window_7d")(spark, sf)
    val bounds = out.agg(min(to_date(col("ts"))), max(to_date(col("ts")))).collect().head
    assert(bounds.getDate(0).toString == "2024-01-24")
    assert(bounds.getDate(1).toString == "2024-01-30")
  }

  test("entry returns the flagship row on sf0.001 (driver t1 contract)") {
    assert(SparkEntry.entry(spark).count() == 1)
  }

  test("every declared oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("dedup cluster assignment: canonical is within group and minimal") {
    val lsh = q("q_dedup_lsh")
    assert(lsh.filter(col("canonical_id") > col("doc_id")).count() == 0)
    val nDocs = q("q_dedup_exact").count() // unique texts ≤ docs
    assert(lsh.count() >= nDocs)
  }

  test("q_sim_topk returns k rows with cosine in [-1, 1] descending") {
    val rows = SparkEntry.queries("q_sim_topk")(spark, sf).collect()
    assert(rows.length == 10)
    val cs = rows.map(_.getAs[Double]("cos"))
    assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
    assert(cs.sameElements(cs.sorted.reverse))
  }

  test("jaccard near-dup pairs are symmetric-free and above threshold") {
    val rows = SparkEntry.queries("q_dedup_near")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Double]("jaccard") >= 0.9)
    }
  }

  test("banding never misses an exact duplicate (J=1 ⇒ identical signature)") {
    // identical texts hash to identical MinHash signatures, hence identical
    // band values — an exact-dup pair is ALWAYS a candidate, so every
    // same-text pair within a language must appear in q_dedup_near's output
    import spark.implicits._
    val docs = T(spark, sf, "documents")
    val exactDupPairs = docs
      .as("a")
      .join(
        docs.as("b"),
        col("a.text") === col("b.text") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
    val near = SparkEntry
      .queries("q_dedup_near")(spark, sf)
      .select("a_id", "b_id")
    assert(exactDupPairs.except(near).count() == 0)
  }

  test("q_dedup_ngram handles sub-3-token documents via the whole-doc fold") {
    // a 2-token and 1-token doc get single-element shingle sets; identical
    // short docs must pair with jaccard 1.0
    import spark.implicits._
    val tiny = Seq(
      (1L, "en", "hi there"),
      (2L, "en", "hi there"),
      (3L, "en", "solo")).toDF("doc_id", "lang", "text")
    tiny.createOrReplaceTempView("graft_tiny_docs")
    // run the shingle pipeline on a substituted source by rebuilding it here
    // with the same public shape: reuse the operator on a temp dir instead
    val dir = java.nio.file.Files.createTempDirectory("graft_tiny").toString
    tiny
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dedup_ngram")(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("a_id") == 1L && out.head.getAs[Long]("b_id") == 2L)
    assert(out.head.getAs[Double]("jaccard") == 1.0d)
  }

  test("q_sim_ivf probes a strict subset: its hits are within brute-force top-k cosine range") {
    val ivf = SparkEntry.queries("q_sim_ivf")(spark, sf).collect()
    val brute = SparkEntry.queries("q_sim_topk")(spark, sf).collect()
    assert(ivf.nonEmpty)
    // ANN cannot beat exact search: best IVF cosine ≤ best brute-force cosine
    assert(ivf.head.getAs[Double]("cos") <= brute.head.getAs[Double]("cos") + 1e-9)
  }

  test("ntile splits uneven partitions SQL-style: larger buckets first, sizes differ by at most 1") {
    import spark.implicits._
    // 10 rows into 4 buckets → sizes 3,3,2,2 (the first n%k buckets get
    // the extra row — the SQL-standard rule both engines implement)
    val df = (1 to 10).map(i => ("p", i)).toDF("g", "v")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v")
    val sizes = df
      .select(ntile(4).over(w).as("q"))
      .groupBy($"q").count().orderBy($"q")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sizes.toSeq == Seq((1, 3L), (2, 3L), (3, 2L), (4, 2L)))
  }

  test("percent_rank and cume_dist hit their closed forms on the edge rows") {
    import spark.implicits._
    // 5 distinct values: percent_rank = (rank-1)/(n-1) → first 0.0, last
    // 1.0; cume_dist = rows≤current/n → first 0.2, last 1.0. With a TIE on
    // the smallest value, both tied rows share percent_rank 0 and
    // cume_dist 2/n.
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"g").orderBy($"v")
    val rows = Seq(("p", 1), ("p", 1), ("p", 2), ("p", 3), ("p", 4))
      .toDF("g", "v")
      .select($"v", percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .orderBy($"v", $"pr")
      .collect()
    assert(rows(0).getDouble(1) == 0.0 && rows(1).getDouble(1) == 0.0)
    assert(rows(0).getDouble(2) == 0.4 && rows(1).getDouble(2) == 0.4)
    assert(rows.last.getDouble(1) == 1.0 && rows.last.getDouble(2) == 1.0)
  }

  test("q_win_dist quartiles are consistent with its own percent_rank") {
    import spark.implicits._
    // ntile(4) bucket k can only hold rows whose percent_rank lies in
    // [(k-1)/4 - eps, k/4 + eps] at bucket-boundary granularity; cheaper
    // invariant: quartile is non-decreasing in prank within a partition
    val bad = q("q_win_dist")
      .select($"event_type", $"quartile", $"prank")
      .groupBy($"event_type", $"quartile")
      .agg(min($"prank").as("lo"), max($"prank").as("hi"))
      .withColumn(
        "nxt",
        lead($"lo", 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"event_type").orderBy($"quartile")))
      .filter($"nxt".isNotNull && $"hi" > $"nxt")
    assert(bad.count() == 0, "quartile ranges overlap out of order")
  }

  test("q_agg_grouping_sets markers disambiguate losslessly; sentinel precondition holds") {
    import spark.implicits._
    val out = q("q_agg_grouping_sets").cache()
    // the grouping() markers enumerate exactly the 4 requested sets
    val sets = out.select($"g_status", $"g_priority").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(sets == Set((0, 0), (0, 1), (1, 0), (1, 1)))
    // exactly one grand-total row, and it carries both sentinels
    val grand = out.filter($"g_status" === 1 && $"g_priority" === 1).collect()
    assert(grand.length == 1)
    assert(grand.head.getAs[String]("status") == "(all)")
    assert(grand.head.getAs[String]("priority") == "(all)")
    // sentinel precondition: the sentinel is lossless only while the real
    // keys are never NULL and never the literal '(all)' — assert it on the
    // data so a future generator change fails loudly here, not in a hash
    val viol = T(spark, sf, "orders")
      .filter(
        $"o_orderstatus".isNull || $"o_orderpriority".isNull ||
          $"o_orderstatus" === "(all)" || $"o_orderpriority" === "(all)")
    assert(viol.count() == 0, "sentinel collision: use the markers, not the sentinel")
    // marginals are consistent: per-set n sums to the grand total
    val total = grand.head.getAs[Long]("n")
    Seq(($"g_status" === 0 && $"g_priority" === 0),
      ($"g_status" === 0 && $"g_priority" === 1),
      ($"g_status" === 1 && $"g_priority" === 0)).foreach { p =>
      assert(out.filter(p).agg(sum($"n")).head().getLong(0) == total)
    }
    out.unpersist()
  }

  test("q_sql_agg equals its DataFrame twin and leaks no temp view") {
    import spark.implicits._
    val out = q("q_sql_agg")
    // same result as the DataFrame-API formulation of the same query
    val twin = T(spark, sf, "lineitem")
      .filter($"l_quantity" <= 45)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1) - $"l_discount").cast("decimal(18,2)")).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
    assert(out.collect().toSeq == twin.collect().toSeq)
    // the view lives only inside the sql() call: no session state escapes
    assert(!spark.catalog.tableExists("graft_sql_lineitem"))
  }

  test("q_index_phrase: planted adjacencies count exactly, including the " +
    "self-phrase and overlapping occurrences; a missing term yields no rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join hash join scan"), // "hash join" x2
      (2L, "join hash"),                // reversed: 0
      (3L, "b b b"),                    // self-phrase "b b": overlapping x2
      (4L, "hash jOin")                 // lowercasing: 1
    ).toDF("doc_id", "text")
    val got = graft.ops.TextOps
      .phraseHits(docs, Seq((1, "hash", "join"), (2, "b", "b"), (3, "hash", "zzz")))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq((1, 1L, 1L, 2L), (1, 2L, 4L, 1L), (2, 1L, 3L, 2L)))
  }

  test("q_stat_ttest matches a hand-computed Welch t on a planted corpus") {
    import spark.implicits._
    // en [10, 14]: n=2, mean 12, var 8; other [4, 6, 8]: n=3, mean 6,
    // var 4 → se = 8/2 + 4/3 = 16/3, t = 6/sqrt(16/3) = 2.598076...,
    // dof = (16/3)² / (16/1 + (4/3)²/2) = 256/152 = 32/19 = 1.684210...
    val planted = Seq(
      (1L, "en", 10L), (2L, "en", 14L),
      (3L, "fr", 4L), (4L, "de", 6L), (5L, "zh", 8L))
      .toDF("doc_id", "lang", "n_chars")
    val r = graft.ops.RelationalOps.statTtestOf(planted).collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 12.0 && r.getDouble(3) === 6.0)
    assert(r.getDouble(4) === 2.598076)
    assert(r.getDouble(5) === 1.684211)
  }

  test("q_profile_table distinct counts agree with the dedup family") {
    import spark.implicits._
    // profile the documents table through the same rendering scheme the
    // events profile uses, and pin its text-distinct count to what
    // q_dedup_exact independently computes: the md5 dedup survivor count
    // IS the number of distinct texts
    val distinctTexts = T(spark, sf, "documents")
      .select(countDistinct($"text")).head().getLong(0)
    assert(distinctTexts == q("q_dedup_exact").count())
    // and the events profile's own invariants: per-column n_rows all equal
    // the table size, key column fully distinct, no nulls anywhere
    val prof = q("q_profile_table").collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct")))
      .toMap
    val nEvents = T(spark, sf, "events").count()
    assert(prof.values.forall(_._1 == nEvents))
    assert(prof("event_id")._3 == nEvents, "key column must be fully distinct")
    assert(prof.values.forall(_._2 == 0L), "testdata has no nulls")
    assert(prof("event_type")._3 == 5L)
  }

  test("q_funnel_paths matches an independent driver-side sessionization") {
    import spark.implicits._
    val gapUs = 8L * 3600 * 1000000L
    // independent recompute in plain Scala from the raw events
    val raw = T(spark, sf, "events")
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"), $"event_type")
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("us"), r.getAs[String]("event_type")))
    val expected = raw
      .groupBy(_._2)
      .values
      .flatMap { evs =>
        val ordered = evs.sortBy(e => (e._3, e._1))
        // split into sessions at gaps > gapUs
        val sessions = ordered.foldLeft(Vector.empty[Vector[(Long, Long, Long, String)]]) {
          case (acc, e) =>
            if (acc.nonEmpty && e._3 - acc.last.last._3 <= gapUs)
              acc.init :+ (acc.last :+ e)
            else acc :+ Vector(e)
        }
        sessions.map(sess => (sess.take(3).map(_._4).mkString(">"), sess.length.toLong))
      }
      .toSeq
      .groupBy(_._1)
      .map { case (path, xs) => (path, xs.size.toLong, xs.map(_._2).sum) }
      .toSeq
      .sortBy(x => (-x._2, x._1))
      .take(20)
    val got = q("q_funnel_paths").collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))
      .toSeq
    assert(got == expected)
  }

  test("q_cohort_retention matches an independent driver-side recompute") {
    import spark.implicits._
    val rows = T(spark, sf, "events")
      .select($"user_id", to_date($"ts").cast("string").as("day"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), java.time.LocalDate.parse(r.getAs[String]("day"))))
    val origin = java.time.LocalDate.parse("2024-01-01")
    val firstTouch = rows.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val expected = rows
      .map { case (u, day) =>
        val c = firstTouch(u)
        (java.time.temporal.ChronoUnit.DAYS.between(origin, c),
          java.time.temporal.ChronoUnit.DAYS.between(c, day), u)
      }
      .distinct
      .groupBy(x => (x._1, x._2))
      .map { case ((c, o), xs) => (c, o, xs.map(_._3).distinct.size.toLong) }
      .toSeq
      .sorted
    val got = q("q_cohort_retention").collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset"), r.getAs[Long]("n_users")))
      .toSeq
    assert(got == expected)
    // every user appears in offset 0 of their own cohort
    val day0 = got.filter(_._2 == 0L).map(_._3).sum
    assert(day0 == firstTouch.size.toLong)
  }

  test("q_source_filter keeps exactly the under-threshold sources, whole") {
    import spark.implicits._
    val docs = T(spark, sf, "documents")
    // independent driver-side recompute of the reputation decision
    val perSource = docs.groupBy($"source")
      .agg(
        count(lit(1)).as("n"),
        sum(when($"n_chars" < 100, 1L).otherwise(0L)).as("bad"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n"), r.getAs[Long]("bad")))
    val keep = perSource.filter { case (_, n, bad) => bad * 100L <= n * 10L }
      .map(_._1).toSet
    assert(keep.nonEmpty && keep.size < perSource.length,
      "threshold must bite: some sources kept, some dropped")
    val out = q("q_source_filter").cache()
    val outSources = out.select($"source").distinct().as[String].collect().toSet
    assert(outSources == keep)
    // a kept source keeps ALL its documents (reputation is per-source,
    // never per-document)
    val expected = perSource.filter(s => keep(s._1)).map(_._2).sum
    assert(out.count() == expected)
    out.unpersist()
  }

  test("q_sample_quota takes min(quota, stratum size) exactly, ranks dense") {
    import spark.implicits._
    // sf0.01 is the scale where both paths exist: fr (64 docs) is under
    // quota, the other four languages are clipped
    val sf01 = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("q_sample_quota")(spark, sf01).cache()
    val langTotals = T(spark, sf01, "documents").groupBy($"lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val got = out.groupBy($"lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(got.keySet == langTotals.keySet, "every stratum represented")
    got.foreach { case (lang, n) =>
      assert(n == math.min(70L, langTotals(lang)), s"$lang: $n")
    }
    // both paths exercised on this data: at least one clipped stratum and
    // at least one under-quota stratum taken whole
    assert(langTotals.values.exists(_ > 70L) && langTotals.values.exists(_ <= 70L))
    // ranks are dense 1..n within each stratum (no gaps, no ties)
    val badRanks = out.groupBy($"lang")
      .agg(count(lit(1)).as("n"), max($"rn").as("mx"), countDistinct($"rn").as("d"))
      .filter($"mx" =!= $"n" || $"d" =!= $"n")
    assert(badRanks.count() == 0)
    out.unpersist()
  }
}
