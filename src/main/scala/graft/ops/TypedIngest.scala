package graft.ops

import graft.{Attempt, T}
import graft.expr.LenientJson
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The typed boundary of the ingest API (SURVEY §1.4): the reference's
  * fixed 7-field output row (main.py:164-172) as a `Dataset[Attempt]`,
  * composed from the same Tier A pieces the untyped queries use — the
  * lenient passback parse (main.py:135-139), the tri-state truthiness
  * cast (main.py:142-145), and the user-id guard of the validation ladder
  * (main.py:146-147). `.as[Attempt]` is schema verification plus
  * compile-time field access for callers; the plan underneath is the same
  * columnar projection as the untyped form — no per-row deserialization
  * until a caller uses a typed lambda.
  */
object TypedIngest {

  def attempts(s: SparkSession, d: String): Dataset[Attempt] = {
    import s.implicits._
    T(s, d, "events")
      .filter($"user_id".isNotNull && length($"user_id") > 0 && $"ts".isNotNull)
      .select(
        $"user_id",
        LenientJson.parsed(coalesce($"props", lit("{}"))).as("pb"),
        when($"value".isNotNull, $"value" =!= lit(0d)).as("is_correct"),
        $"event_type".as("attempt_type"),
        $"ts".as("event_timestamp"))
      .select(
        $"user_id",
        element_at($"pb", "oauth_consumer_key").as("oauth_consumer_key"),
        element_at($"pb", "lis_result_sourcedid").as("lis_result_sourcedid"),
        element_at($"pb", "lis_outcome_service_url").as("lis_outcome_service_url"),
        $"is_correct",
        $"attempt_type",
        $"event_timestamp")
      .as[Attempt]
  }
}
