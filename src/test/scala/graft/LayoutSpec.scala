package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The two claims of the Z-order layout (LayoutOps): the Morton tiles are
  * small rectangles, and a z-sorted parquet file prunes a
  * two-dimensional predicate at the row-group level where a shuffled
  * layout cannot.
  */
class LayoutSpec extends SparkSpec {

  test("q_layout_zorder tiles are 8x8 rectangles") {
    val rows = SparkEntry.queries("q_layout_zorder")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("day_max") - r.getAs[Long]("day_min") < 8, r)
      assert(r.getAs[Long]("u_max") - r.getAs[Long]("u_min") < 8, r)
    }
  }

  private def scannedRows(path: String, pred: Column): (Long, Long) = {
    val df = spark.read.parquet(path).filter(pred)
    // collect THIS DataFrame: metrics live on the executed plan instance
    val result = df.collect().length.toLong
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scanned = plan
      .collectWithSubqueries { case s: FileSourceScanExec => s }
      .map(_.metrics("numOutputRows").value)
      .sum
    (scanned, result)
  }

  test("z-sorted layout prunes a 2-dim predicate; shuffled layout scans everything") {
    import spark.implicits._
    val ev = T(spark, sf, "events").select(
      datediff(to_date($"ts"), lit("2024-01-01").cast("date")).cast("long").as("day_off"),
      $"user_id",
      $"event_id")
    val zDir = "/tmp/graft-test/zorder"
    val rDir = "/tmp/graft-test/shuffled"
    // tiny row groups so sf0.001's 1k events span many of them: the
    // pruning granularity, not the data volume, is what's under test
    graft.ops.LayoutOps
      .writeZOrdered(ev, $"day_off", $"user_id", zDir, partitions = 2, blockBytes = 4 * 1024)
    ev.withColumn("h", md5($"event_id".cast("string")))
      .repartitionByRange(2, $"h")
      .sortWithinPartitions($"h")
      .drop("h")
      .write
      .option("parquet.block.size", (4 * 1024).toString)
      .mode("overwrite")
      .parquet(rDir)
    val pred =
      $"day_off".between(2L, 5L) && $"user_id".between(10L, 20L)
    val (zScanned, zRows) = scannedRows(zDir, pred)
    val (rScanned, rRows) = scannedRows(rDir, pred)
    assert(zRows == rRows, "layouts must agree on the answer")
    // the shuffled layout reads essentially the whole table; the z-sorted
    // layout's row-group stats exclude most of it
    assert(zScanned * 2 < rScanned, s"z=$zScanned shuffled=$rScanned")
  }

  test("compact rewrites a many-small-files table into the target file count") {
    import spark.implicits._
    val smallDir = "/tmp/graft-test/small_files"
    val bigDir = "/tmp/graft-test/compacted"
    val docs = T(spark, sf, "documents")
    // simulate the streaming-ingest aftermath: one tiny file per partition
    docs.repartition(64).write.mode("overwrite").parquet(smallDir)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(smallDir) == 64)
    val written = graft.ops.LayoutOps.compact(spark, smallDir, bigDir, targetRowsPerFile = 200L)
    // 500 docs at 200 rows/file → 3 files, evenly sized by round-robin
    assert(written == 3 && parquetFiles(bigDir) == 3)
    val back = spark.read.parquet(bigDir)
    assert(back.count() == docs.count())
    assert(
      back.select("doc_id").except(docs.select("doc_id")).count() == 0 &&
        docs.select("doc_id").except(back.select("doc_id")).count() == 0)
  }
}
