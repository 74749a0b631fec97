package graft

import java.nio.file.Files
import graft.ops.IngestOps
import org.apache.spark.sql.functions._

/** The engine's second wire format ([[IngestOps.readCsvEvents]]): CSV with
  * RFC-4180 quoting for the embedded-JSON props column, a typed schema,
  * and the corrupt-record side channel — malformed lines null out and
  * surface in `_corrupt` instead of failing the job, mirroring the JSON
  * source's contract.
  */
class CsvSourceSpec extends SparkSpec {

  test("schema-enforced CSV read round-trips the events exactly") {
    val dir = Files.createTempDirectory("graft_csv_src").toString + "/events"
    val batch = T(spark, sf, "events")
    batch.coalesce(1).write
      .option("header", "true")
      .option("escape", "\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(dir)
    // cache: Spark disallows querying ONLY the corrupt column from a raw
    // CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — parse once, then ask
    val back = IngestOps.readCsvEvents(spark, dir).cache()
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = batch.select(cols.map(col): _*).orderBy("event_id").collect().map(_.toString)
    val b = back.select(cols.map(col): _*).orderBy("event_id").collect().map(_.toString)
    assert(a.length == b.length && a.sameElements(b))
    // nothing corrupt on a clean write
    assert(back.filter(col("_corrupt").isNotNull).count() == 0)
    back.unpersist()
  }

  test("malformed lines land in the corrupt side channel, job never fails") {
    val dir = Files.createTempDirectory("graft_csv_bad").toString + "/events"
    val batch = T(spark, sf, "events").limit(5)
    batch.coalesce(1).write
      .option("header", "true")
      .option("escape", "\"")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(dir)
    // a line whose event_id is not a BIGINT: typed fields null, raw line
    // preserved in _corrupt
    Files.writeString(
      java.nio.file.Paths.get(dir, "part-junk.csv"),
      "event_id,ts,user_id,event_type,value,props\n" +
        "not_a_number,2024-01-01T00:00:00.000000Z,1,click,1.0,{}\n")
    val back = IngestOps.readCsvEvents(spark, dir).cache()
    assert(back.count() == 6) // 5 good + 1 rejected
    val bad = back.filter(col("_corrupt").isNotNull)
    assert(bad.count() == 1)
    assert(bad.head().getAs[String]("_corrupt").startsWith("not_a_number"))
    assert(bad.head().isNullAt(bad.head().fieldIndex("event_id")))
    back.unpersist()
  }
}
