package graft.expr

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{coalesce, from_json, udf}
import org.apache.spark.sql.types.{MapType, StringType}

/** Lenient semi-structured parser mirroring the reference's
  * `safe_parse_passback` (/root/reference/main.py:94-101): strict JSON
  * first, then a Python-dict-literal fallback (single quotes,
  * True/False/None keywords, as `ast.literal_eval` would accept), and `{}`
  * for anything unparseable — never throws.
  *
  * Execution strategy for scale: `parsed(col)` composes the codegen'd
  * built-in `from_json` as the fast path with the UDF only as a per-row
  * fallback (`coalesce` short-circuits), so on a 100 TB scan of valid-JSON
  * rows the interpreted path never runs.
  */
object LenientJson {

  @transient private lazy val mapper = new ObjectMapper()

  /** Total function String → Map (possibly empty), mirroring main.py:94-101
    * (JSON, then literal dialect, then {}) and main.py:135-136 (null/empty
    * input → {}).
    */
  def parseToMap(s: String): Map[String, String] = {
    if (s == null || s.trim.isEmpty) Map.empty
    else
      tryJson(s)
        .orElse(tryJson(normalizePyLiteral(s)))
        .getOrElse(Map.empty)
  }

  private def tryJson(s: String): Option[Map[String, String]] =
    try {
      val node = mapper.readTree(s)
      if (node == null || !node.isObject) None
      else {
        val b = Map.newBuilder[String, String]
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> jsonValueAsString(e.getValue)
        }
        Some(b.result())
      }
    } catch { case _: Exception => None }

  /** Scalar stringification matching Spark's from_json with
    * map<string,string> (numbers/booleans keep their JSON text form).
    */
  private def jsonValueAsString(v: JsonNode): String =
    if (v.isNull) null
    else if (v.isTextual) v.asText()
    else v.toString

  /** Conservative Python-dict-literal → JSON normalization: outside of
    * string literals swap quotes and keywords (True/False/None). Not a full
    * Python parser — anything it mangles simply fails the JSON retry and
    * yields {}, which is exactly the reference's accept-or-{} contract.
    */
  private[graft] def normalizePyLiteral(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    var quote = 0.toChar // 0 = outside any string literal
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == '\\' && i + 1 < s.length) { // keep escapes intact
          sb.append('\\').append(s.charAt(i + 1)); i += 1
        } else if (c == quote) { sb.append('"'); quote = 0 }
        else if (c == '"') sb.append("\\\"")
        else sb.append(c)
      } else if (c == '\'' || c == '"') { quote = c; sb.append('"') }
      else if (s.startsWith("True", i) && bareWordAt(s, i, 4)) { sb.append("true"); i += 3 }
      else if (s.startsWith("False", i) && bareWordAt(s, i, 5)) { sb.append("false"); i += 4 }
      else if (s.startsWith("None", i) && bareWordAt(s, i, 4)) { sb.append("null"); i += 3 }
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def bareWordAt(s: String, i: Int, len: Int): Boolean = {
    val before = i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))
    val after = i + len >= s.length || !Character.isLetterOrDigit(s.charAt(i + len))
    before && after
  }

  private val parseUdf = udf(parseToMap _)

  /** Interpreted fallback path as a Column. */
  def lenient(c: Column): Column = parseUdf(c)

  /** Production parse: codegen'd `from_json` fast path, UDF only for rows
    * the strict parser rejects.
    */
  def parsed(c: Column): Column =
    coalesce(from_json(c, MapType(StringType, StringType)), parseUdf(c))
}
