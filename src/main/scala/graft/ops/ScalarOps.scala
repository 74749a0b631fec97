package graft.ops

import graft.{QueryDef, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Tier B scalar-function surface (SURVEY §2): string / date / math / json /
  * array / map expression coverage, all codegen'd built-ins.
  */
object ScalarOps {

  /** q_scalar_str — string functions over nation (slicing main.py:78,
    * formatting main.py:320,384 analogs).
    */
  private def scalarStr(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T(s, d, "nation")
      .select(
        $"n_nationkey",
        upper($"n_name").as("uname"),
        lower($"n_name").as("lname"),
        substring($"n_name", 1, 3).as("prefix"),
        concat_ws("-", $"n_name", $"n_regionkey".cast("string")).as("label"),
        length($"n_name").as("len"),
        $"n_name".like("%A%").as("has_a"),
        lpad($"n_name", 12, ".").as("padded"),
        split($"n_name", " ").getItem(0).as("first_word"))
      .orderBy("n_nationkey")
  }

  /** q_scalar_date — date/time functions over events (reference date logic
    * main.py:62,78-80,104-105,288,296).
    */
  private def scalarDate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T(s, d, "events")
      .select(
        $"event_id",
        to_date($"ts").as("d"),
        date_trunc("hour", $"ts").as("h"),
        year($"ts").as("yr"),
        month($"ts").as("mo"),
        dayofmonth($"ts").as("dom"),
        hour($"ts").as("hr"),
        date_add(to_date($"ts"), 7).as("d_plus7"))
      .orderBy("event_id")
  }

  /** q_scalar_math — arithmetic over lineitem (main.py:283 analog). Money
    * math in decimals; ceil/floor normalized to BIGINT in both engines.
    */
  private def scalarMath(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T(s, d, "lineitem")
      .select(
        $"l_orderkey",
        $"l_linenumber",
        round(
          $"l_extendedprice".cast("decimal(18,2)") *
            (lit(1) - $"l_discount").cast("decimal(18,2)"),
          2).cast("double").as("disc_price"),
        abs($"l_quantity" - lit(25d)).as("qty_dev"),
        ceil($"l_quantity" / 7d).as("qty_ceil7"),
        floor($"l_quantity" / 7d).as("qty_floor7"),
        pmod($"l_orderkey", lit(7)).as("key_mod7"),
        greatest($"l_tax", $"l_discount").as("max_rate"),
        least($"l_tax", $"l_discount").as("min_rate"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q_scalar_json — typed JSON extraction feeding an aggregate
    * (main.py:94-101,137-139 analog).
    */
  private def scalarJson(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T(s, d, "events")
      .select(
        $"event_type",
        get_json_object($"props", "$.k").cast("bigint").as("k"))
      .groupBy($"event_type")
      .agg(
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** q_scalar_array — higher-order array functions over embeddings: the
    * UDF-free norm/aggregation pattern Tier C builds on. Left-fold
    * aggregate matches DuckDB's list_reduce fold order exactly.
    */
  private def scalarArray(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T(s, d, "embeddings")
      .select(
        $"vec_id",
        size($"embedding").as("dim"),
        aggregate(
          transform($"embedding", x => x.cast("double") * x.cast("double")),
          lit(0d),
          (acc, x) => acc + x).as("norm2"),
        array_max($"embedding").cast("double").as("max_v"),
        array_min($"embedding").cast("double").as("min_v"),
        element_at($"embedding", 1).cast("double").as("first_v"))
      .orderBy("vec_id")
  }

  /** q_scalar_map — parsed-map functions + explode: key/value frequency
    * over the semi-structured column (SURVEY §1.1 map type).
    */
  private def scalarMap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T(s, d, "events")
      .select(explode(from_json($"props", MapType(StringType, StringType))))
      .groupBy($"key", $"value")
      .agg(count(lit(1)).as("n"))
      .orderBy("key", "value")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_scalar_str",
      scalarStr,
      Some(
        "SELECT n_nationkey, upper(n_name) AS uname, lower(n_name) AS lname, " +
          "substring(n_name, 1, 3) AS prefix, " +
          "concat_ws('-', n_name, CAST(n_regionkey AS VARCHAR)) AS label, " +
          "CAST(length(n_name) AS INTEGER) AS len, " +
          "n_name LIKE '%A%' AS has_a, " +
          "lpad(n_name, 12, '.') AS padded, " +
          "string_split(n_name, ' ')[1] AS first_word " +
          "FROM nation ORDER BY n_nationkey")),
    QueryDef(
      "q_scalar_date",
      scalarDate,
      Some(
        "SELECT event_id, CAST(ts AS DATE) AS d, " +
          "date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, " +
          "CAST(EXTRACT(year FROM ts) AS INTEGER) AS yr, " +
          "CAST(EXTRACT(month FROM ts) AS INTEGER) AS mo, " +
          "CAST(EXTRACT(day FROM ts) AS INTEGER) AS dom, " +
          "CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr, " +
          "CAST(ts AS DATE) + 7 AS d_plus7 " +
          "FROM events ORDER BY event_id")),
    QueryDef(
      "q_scalar_math",
      scalarMath,
      Some(
        "SELECT l_orderkey, l_linenumber, " +
          "CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "CAST(1 - l_discount AS DECIMAL(18,2)), 2) AS DOUBLE) AS disc_price, " +
          "abs(l_quantity - 25) AS qty_dev, " +
          "CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7, " +
          "CAST(floor(l_quantity / 7) AS BIGINT) AS qty_floor7, " +
          "((l_orderkey % 7) + 7) % 7 AS key_mod7, " +
          "greatest(l_tax, l_discount) AS max_rate, " +
          "least(l_tax, l_discount) AS min_rate " +
          "FROM lineitem ORDER BY l_orderkey, l_linenumber")),
    QueryDef(
      "q_scalar_json",
      scalarJson,
      Some(
        "SELECT event_type, " +
          "CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
          "MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k, " +
          "MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k, " +
          "COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type")),
    QueryDef(
      "q_scalar_array",
      scalarArray,
      Some(
        "SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, " +
          "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
          "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), " +
          "(a, b) -> a + b) AS norm2, " +
          "CAST(list_max(embedding) AS DOUBLE) AS max_v, " +
          "CAST(list_min(embedding) AS DOUBLE) AS min_v, " +
          "CAST(embedding[1] AS DOUBLE) AS first_v " +
          "FROM embeddings ORDER BY vec_id")),
    QueryDef(
      "q_scalar_map",
      scalarMap,
      Some(
        "SELECT k AS key, json_extract_string(props, '$.' || k) AS value, " +
          "COUNT(*) AS n FROM " +
          "(SELECT unnest(json_keys(props)) AS k, props FROM events) " +
          "GROUP BY 1, 2 ORDER BY key, value"))
  )
}
