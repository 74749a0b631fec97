package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev smoke: replicates the driver's t1 check — SparkEntry.entry must
  * return rows > 0 on sf0.001 under a plain session (no special confs).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n queries=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size}")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
