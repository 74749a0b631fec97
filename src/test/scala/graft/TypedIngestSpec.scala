package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** The SURVEY §1.4 typed boundary: `TypedIngest.attempts` IS a
  * `Dataset[Attempt]` (the val annotation below is the compile-time
  * check), its fields round-trip the reference's passback extraction on
  * crafted LTI rows, and it agrees with the untyped Tier A pieces on the
  * real testdata.
  */
class TypedIngestSpec extends SparkSpec {

  test("attempts extracts the 7 reference fields, typed (crafted LTI rows)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_typed").toString
    Seq(
      // full passback, correct attempt
      (1L, "u1", "2024-01-05 01:02:03", "click", 1.0d,
        """{"oauth_consumer_key": "ck", "lis_result_sourcedid": "sid", "lis_outcome_service_url": "http://x"}"""),
      // python-literal dialect passback, incorrect attempt
      (2L, "u2", "2024-01-06 01:02:03", "view", 0.0d,
        "{'oauth_consumer_key': 'ck2', 'note': None}"),
      // empty passback, null value -> is_correct None
      (3L, "u3", "2024-01-07 01:02:03", "error", Double.NaN, "{}"))
      .toDF("event_id", "user_id", "ts_s", "event_type", "value", "props")
      .select(
        $"event_id",
        $"user_id",
        // testdata schema stores ts as nanosecond longs (graft.T contract)
        (unix_timestamp($"ts_s").cast("long") * 1000000000L).as("ts"),
        $"event_type",
        when(isnan($"value"), lit(null)).otherwise($"value").as("value"),
        $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ds: Dataset[Attempt] = graft.ops.TypedIngest.attempts(spark, dir)
    val rows = ds.collect().sortBy(_.user_id)
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.oauth_consumer_key.contains("ck"))
    assert(r1.lis_result_sourcedid.contains("sid"))
    assert(r1.lis_outcome_service_url.contains("http://x"))
    assert(r1.is_correct.contains(true))
    assert(r1.attempt_type.contains("click"))
    val r2 = rows(1)
    assert(r2.oauth_consumer_key.contains("ck2"), "python-literal passback must parse")
    assert(r2.lis_result_sourcedid.isEmpty)
    assert(r2.is_correct.contains(false))
    val r3 = rows(2)
    assert(r3.oauth_consumer_key.isEmpty)
    assert(r3.is_correct.isEmpty, "NULL value must stay None, not false")
  }

  test("attempts agrees with the untyped Tier A pieces on the testdata") {
    import spark.implicits._
    val ds = graft.ops.TypedIngest.attempts(spark, sf)
    // same guard as the typed filter, applied untyped
    val guarded = T(spark, sf, "events")
      .filter($"user_id".isNotNull && length($"user_id") > 0 && $"ts".isNotNull)
    assert(ds.count() == guarded.count())
    // is_correct distribution matches q_cast_bool's on the guarded subset
    val typedTrue = ds.filter(_.is_correct.contains(true)).count()
    val untypedTrue = guarded
      .select(when($"value".isNotNull, $"value" =!= lit(0d)).as("c"))
      .filter($"c" === true)
      .count()
    assert(typedTrue == untypedTrue)
  }
}
