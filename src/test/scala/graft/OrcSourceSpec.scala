package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Third storage format: ORC (bundled with Spark, no extra dependency).
  * The engine's operators are format-agnostic — anything `spark.read`
  * yields feeds the same plans — so the contract to prove is exact
  * round-trip fidelity including the µs-truncated timestamps, plus
  * predicate pushdown reaching the ORC scan like it does parquet.
  */
class OrcSourceSpec extends SparkSpec {

  test("ORC round-trips the events exactly, with pushdown at the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/events"
    val batch = T(spark, sf, "events")
    batch.write.orc(dir)
    val back = spark.read.orc(dir)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = batch.select(cols.map(col): _*).orderBy("event_id").collect().map(_.toString)
    val b = back.select(cols.map(col): _*).orderBy("event_id").collect().map(_.toString)
    assert(a.length == b.length && a.sameElements(b))
    // the filter must reach the ORC scan as a pushed predicate
    val plan = back.filter(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]"), plan)
  }
}
