package graft

import java.nio.file.Files
import graft.ops.IngestOps
import org.apache.spark.sql.functions._

/** The reference ingests JSON (main.py:113-125); the engine's JSON source
  * must round-trip the events exactly and tolerate malformed records the
  * way the reference tolerates malformed responses.
  */
class JsonSourceSpec extends SparkSpec {

  test("schema-enforced JSON read round-trips the parquet events exactly") {
    val dir = Files.createTempDirectory("graft_json").toString + "/events"
    val batch = T(spark, sf, "events")
    batch.coalesce(1).write
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(dir)
    val back = IngestOps.readJsonEvents(spark, dir)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = batch.select(cols.map(col): _*).orderBy("event_id").collect().map(_.toString)
    val b = back.select(cols.map(col): _*).orderBy("event_id").collect().map(_.toString)
    assert(a.length == b.length && a.sameElements(b))
  }

  test("malformed records null out, never fail the job (main.py:113-125 contract)") {
    val dir = Files.createTempDirectory("graft_json_bad").toString + "/events"
    val batch = T(spark, sf, "events").limit(5)
    batch.coalesce(1).write.json(dir)
    Files.writeString(
      java.nio.file.Paths.get(dir, "part-junk.json"),
      "{this is not json\n")
    val back = IngestOps.readJsonEvents(spark, dir)
    assert(back.count() == 6) // 5 good + 1 nulled row
    assert(back.filter(col("event_id").isNull).count() == 1)
  }
}
