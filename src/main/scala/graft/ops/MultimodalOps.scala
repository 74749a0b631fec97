package graft.ops

import graft.{QueryDef, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier C multimodal plumbing (charter): media as opaque binary columns
  * with typed metadata, decode/feature-extraction behind a narrow stub.
  * The Spark-side shape is real — binary payloads, a deterministic
  * decode UDF returning a typed struct, per-partition batching — while the
  * actual codec (image/audio libs absent in this environment) is the one
  * stubbed step, clearly marked in [[decodeStub]].
  */
object MultimodalOps {

  private def docs(s: SparkSession, d: String) = T(s, d, "documents")

  /** The testdata has no media files, so the binary payload is the UTF-8
    * encoding of the text column — byte-for-byte reproducible in DuckDB via
    * encode().
    */
  private def payload = encode(col("text"), "UTF-8")

  /** q_mm_binary — binary column + typed metadata: byte length and a
    * content fingerprint from the hex prefix (hex normalized to lowercase:
    * Spark emits uppercase, DuckDB lowercase).
    */
  private def mmBinary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d)
      .select(
        $"doc_id",
        length(payload).as("n_bytes"),
        // slice the first 8 bytes BEFORE hex: equivalent output, but avoids
        // hex-encoding the entire payload to keep 16 chars
        lower(hex(substring(payload, 1, 8))).as("fp_hex"))
      .orderBy("doc_id")
  }

  /** STUB of the real media decode — deterministic fake features from the
    * payload bytes. A real deployment swaps the body for an image/audio
    * codec; the signature (bytes in, typed struct out) and the Spark
    * plumbing around it are the real design.
    */
  case class MediaFeatures(n_codepoints: Long, checksum: Long)
  def decodeStub(bytes: Array[Byte]): MediaFeatures = {
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    var sum = 0L
    text.codePoints().forEach(cp => sum += cp)
    MediaFeatures(text.codePointCount(0, text.length).toLong, sum % 9973L)
  }

  private val decodeUdf = udf(decodeStub _)

  /** q_mm_features — decode-and-featurize over the binary column: the
    * extract step of an image/audio pipeline, with the codec stubbed. The
    * UDF is the one interpreted hop; everything around it stays columnar.
    */
  private def mmFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d)
      .select($"doc_id", decodeUdf(payload).as("f"))
      .select(
        $"doc_id",
        $"f.n_codepoints".as("n_codepoints"),
        $"f.checksum".as("checksum"))
      .orderBy("doc_id")
  }

  /** Oracle recomputes the stub arithmetic on the character stream (the
    * testdata text is ASCII, so codepoints == bytes).
    */
  private val FeaturesSql =
    "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_codepoints, " +
      "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      "(a, v) -> a + v) % 9973 AS checksum " +
      "FROM documents ORDER BY doc_id"

  /** STUB of a real media resize — deterministic byte-stride downsample to
    * ≤ 64 bytes. A real deployment swaps the body for an image resampler
    * (bilinear/Lanczos over decoded pixels); the signature (bytes + target
    * size in, bytes out) and the Spark plumbing are the real design.
    */
  private val ResizeTarget = 64
  def resizeStub(bytes: Array[Byte], target: Int): Array[Byte] = {
    val step = (bytes.length + target - 1) / target // ceil — step ≥ 1 for n ≥ 1
    if (bytes.length <= target) bytes
    else Array.range(0, bytes.length, step).map(bytes(_))
  }

  private val resizeUdf = udf(resizeStub _)

  /** q_mm_resize — resize step of an image pipeline over the binary
    * column: per-row kernel bytes→bytes with a size contract, metadata
    * (original size, stride, new size) carried alongside. Map-side only.
    */
  private def mmResize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d)
      .select($"doc_id", resizeUdf(payload, lit(ResizeTarget)).as("r"), length(payload).as("orig_bytes"))
      .select(
        $"doc_id",
        $"orig_bytes",
        length($"r").as("new_bytes"),
        lower(hex($"r")).as("preview_hex"))
      .orderBy("doc_id")
  }

  /** Oracle recomputes the stride on the character stream (ASCII text ⇒
    * bytes ≡ chars).
    */
  private val ResizeSql = {
    val step = s"CAST(ceil(len(text) / ${ResizeTarget}.0) AS BIGINT)"
    "SELECT doc_id, orig_bytes, CAST(octet_length(encode(r)) AS INTEGER) AS new_bytes, " +
      "lower(hex(encode(r))) AS preview_hex FROM (" +
      "SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS orig_bytes, " +
      s"CASE WHEN len(text) <= $ResizeTarget THEN text ELSE " +
      s"list_reduce(list_transform(generate_series(1, len(text), $step), i -> text[i]), " +
      "(a, b) -> a || b) END AS r " +
      "FROM documents) ORDER BY doc_id"
  }

  /** q_mm_sample — frame-sampling analog: every 10th token of the payload
    * stream (for video this is the keyframe stride; the indexing pattern is
    * identical).
    */
  private def mmSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = split($"text", " ")
    val sampled = transform(sequence(lit(1), size(t), lit(10)), i => element_at(t, i))
    docs(s, d)
      .select(
        $"doc_id",
        size(sampled).as("n_frames"),
        concat_ws(" ", sampled).as("sample_txt"))
      .orderBy("doc_id")
  }

  private val SampleSql =
    "SELECT doc_id, CAST(len(sampled) AS INTEGER) AS n_frames, " +
      "array_to_string(sampled, ' ') AS sample_txt FROM (" +
      "SELECT doc_id, list_transform(generate_series(1, len(t), 10), i -> t[i]) AS sampled " +
      "FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)) " +
      "ORDER BY doc_id"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_mm_binary",
      mmBinary,
      Some(
        "SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, " +
          "lower(substring(hex(encode(text)), 1, 16)) AS fp_hex " +
          "FROM documents ORDER BY doc_id")),
    QueryDef("q_mm_features", mmFeatures, Some(FeaturesSql)),
    QueryDef("q_mm_resize", mmResize, Some(ResizeSql)),
    QueryDef("q_mm_sample", mmSample, Some(SampleSql))
  )
}
