package graft

import java.nio.file.Files
import graft.ops.{ReportOps, Sinks}
import org.apache.spark.sql.functions._

/** Engine-side sink semantics (SURVEY §2 sinks): idempotent keyed append
  * (ON CONFLICT analog), overwrite CSV snapshot with header, text report
  * rendering.
  */
class SinksSpec extends SparkSpec {

  test("idempotentAppend drops already-present keys (main.py:192-202)") {
    import spark.implicits._
    val existing = Seq(("u1", 1L), ("u2", 2L)).toDF("user_id", "ts")
    val staged = Seq(("u1", 1L), ("u3", 3L), ("u3", 3L)).toDF("user_id", "ts")
    val out = Sinks.idempotentAppend(existing, staged, Seq("user_id", "ts"))
    // u1 already exists → dropped; u3 staged twice → both survive the anti
    // join (in-batch dedup is q_dedup_key's job, applied before staging)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("u3", "u3"))
  }

  test("re-running the append after commit adds nothing (exactly-once)") {
    import spark.implicits._
    val existing = Seq(("u1", 1L)).toDF("user_id", "ts")
    val staged = Seq(("u1", 1L), ("u2", 2L)).toDF("user_id", "ts")
    val firstRun = Sinks.idempotentAppend(existing, staged, Seq("user_id", "ts"))
    val afterCommit = existing.unionByName(firstRun)
    val rerun = Sinks.idempotentAppend(afterCommit, staged, Seq("user_id", "ts"))
    assert(rerun.count() == 0)
  }

  test("idempotentAppendJdbc end-to-end against embedded Derby (main.py:180-228)") {
    import spark.implicits._
    val db = Files.createTempDirectory("graft_derby").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val staged = Seq(("u1", 1L), ("u2", 2L)).toDF("user_id", "ts")
    // first run creates the table and inserts both rows
    Sinks.idempotentAppendJdbc(staged, url, "attempts", Seq("user_id", "ts"))
    assert(spark.read.jdbc(url, "attempts", new java.util.Properties).count() == 2)
    // rerun with an overlapping batch: only the new key lands (ON CONFLICT
    // DO NOTHING semantics across the 7-day overlapping re-extract)
    val overlap = Seq(("u1", 1L), ("u3", 3L)).toDF("user_id", "ts")
    Sinks.idempotentAppendJdbc(overlap, url, "attempts", Seq("user_id", "ts"))
    val rows = spark.read.jdbc(url, "attempts", new java.util.Properties)
    assert(rows.count() == 3)
    assert(
      rows.select("user_id").as[String].collect().sorted.toSeq ==
        Seq("u1", "u2", "u3"))
    // identical rerun is a no-op (exactly-once)
    Sinks.idempotentAppendJdbc(overlap, url, "attempts", Seq("user_id", "ts"))
    assert(spark.read.jdbc(url, "attempts", new java.util.Properties).count() == 3)
  }

  test("upsertSnapshotSwapJdbc: replace-by-key through an atomic staging swap (Derby)") {
    import spark.implicits._
    val db = Files.createTempDirectory("graft_derby_swap").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties
    // create path
    Sinks.upsertSnapshotSwapJdbc(
      Seq(("u1", 1L), ("u2", 2L)).toDF("user_id", "n"), url, "totals", Seq("user_id"))
    // upsert: u2 replaced, u3 inserted, u1 kept — published via the swap
    val batch = Seq(("u2", 20L), ("u3", 3L)).toDF("user_id", "n")
    Sinks.upsertSnapshotSwapJdbc(batch, url, "totals", Seq("user_id"))
    def state(): Map[String, Long] = spark.read.jdbc(url, "totals", props)
      .as[(String, Long)].collect().toMap
    assert(state() == Map("u1" -> 1L, "u2" -> 20L, "u3" -> 3L))
    // the staging table does not outlive a successful publish (it was
    // renamed into place, not copied)
    intercept[Exception] {
      spark.read.jdbc(url, "totals_swap_staging", props).count()
    }
    // re-applying the same batch converges (exactly-once under retries)
    Sinks.upsertSnapshotSwapJdbc(batch, url, "totals", Seq("user_id"))
    assert(state() == Map("u1" -> 1L, "u2" -> 20L, "u3" -> 3L))
    // a crashed attempt's leftover staging table is reclaimed by the next
    // run: plant one, then upsert again
    Seq(("zz", 99L)).toDF("user_id", "n")
      .write.jdbc(url, "totals_swap_staging", props)
    Sinks.upsertSnapshotSwapJdbc(
      Seq(("u4", 4L)).toDF("user_id", "n"), url, "totals", Seq("user_id"))
    assert(state() == Map("u1" -> 1L, "u2" -> 20L, "u3" -> 3L, "u4" -> 4L))
  }

  test("overwriteCsvSnapshot writes a single headered file, twice-runnable") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val path = dir.getAbsolutePath + "/snap"
    val df = SparkEntry.queries("q_sheet_export")(spark, sf).limit(5)
    Sinks.overwriteCsvSnapshot(df, path)
    Sinks.overwriteCsvSnapshot(df, path) // overwrite must be idempotent
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head == "rn,c_event_id,c_user_id,c_event_type")
    assert(lines.tail.head.startsWith("0,event_id,user_id,event_type"))
  }

  test("writeCorpusShards: hive layout, pruned reads, deterministic rerun") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_shards").toFile
    val path = dir.getAbsolutePath + "/corpus"
    val curated = T(spark, sf, "documents")
      .select(
        $"doc_id",
        $"lang",
        $"n_chars",
        when(pmod(graft.ops.Hashing.h32(concat($"doc_id".cast("string"), lit("|split"))), lit(100L)) < 80, "train")
          .otherwise("valid")
          .as("split"))
    Sinks.writeCorpusShards(curated, path)
    // hive directory layout: split=*/lang=* on disk
    val splitDirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(splitDirs.toSet == Set("split=train", "split=valid"), splitDirs.toSeq)
    val langDirs = new java.io.File(path + "/split=train").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(langDirs.forall(_.startsWith("lang=")) && langDirs.length >= 2, langDirs.toSeq)
    // the training read path is partition-pruned: the split predicate is a
    // PartitionFilter on the scan, and only train directories are read
    val train = spark.read.parquet(path).filter($"split" === "train")
    val plan = train.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"), plan)
    assert(train.count() == curated.filter($"split" === "train").count())
    // full round trip and overwrite idempotence
    Sinks.writeCorpusShards(curated, path)
    val back = spark.read.parquet(path)
    assert(back.count() == curated.count())
    assert(
      back.select("doc_id").except(curated.select("doc_id")).count() == 0 &&
        curated.select("doc_id").except(back.select("doc_id")).count() == 0)
    // each (split, lang) directory holds exactly one file: the
    // repartition-before-write bounds file count at one per owning task
    val leafFiles = new java.io.File(path + "/split=train").listFiles()
      .filter(_.isDirectory)
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(leafFiles.forall(_ == 1), leafFiles.toSeq)
  }

  test("writeJsonlShards: gzip JSONL leaves, exact round trip, stable line format") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    val path = dir.getAbsolutePath + "/corpus"
    val curated = T(spark, sf, "documents")
      .select(
        $"doc_id",
        $"lang",
        $"text",
        when(pmod(graft.ops.Hashing.h32(concat($"doc_id".cast("string"), lit("|split"))), lit(100L)) < 80, "train")
          .otherwise("valid")
          .as("split"))
    Sinks.writeJsonlShards(curated, path)
    // hive layout with gzip'd .json leaves
    val splitDirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(splitDirs.toSet == Set("split=train", "split=valid"), splitDirs.toSeq)
    val leaf = new java.io.File(path + "/split=train").listFiles().filter(_.isDirectory).head
    val files = leaf.listFiles()
      .filter(f => f.getName.contains(".json") && !f.getName.startsWith("."))
    assert(files.length == 1 && files.head.getName.endsWith(".gz"), files.map(_.getName).toSeq)
    // exact round trip through the json reader (schema from the writer)
    val back = spark.read
      .schema("doc_id LONG, text STRING, lang STRING, split STRING")
      .json(path)
    assert(back.count() == curated.count())
    assert(back.select("doc_id", "text").except(curated.select("doc_id", "text")).count() == 0)
    // a raw line is one self-contained JSON object with schema-ordered keys
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      new java.util.zip.GZIPInputStream(new java.io.FileInputStream(files.head))))
    val line = try in.readLine() finally in.close()
    assert(line.startsWith("{\"doc_id\":"), line.take(60))
    assert(line.contains("\"text\":"), line.take(60))
    // overwrite idempotence
    Sinks.writeJsonlShards(curated, path)
    assert(spark.read
      .schema("doc_id LONG, text STRING, lang STRING, split STRING")
      .json(path).count() == curated.count())
  }

  test("renderTextReport renders the 7 fields (main.py:388-406)") {
    val txt = Sinks
      .renderTextReport(ReportOps.aggDaily(spark, sf))
      .collect()
      .head
      .getString(0)
    assert(txt.contains(s"Daily report for ${T.AsOf}"))
    assert(txt.contains("Success rate: "))
    assert(txt.split("\n").length == 7)
  }
}
