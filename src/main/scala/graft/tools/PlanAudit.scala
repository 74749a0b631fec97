package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "BNLJ" -> p.contains("BroadcastNestedLoopJoin"),
          "InMemoryRelation" -> p.contains("InMemoryRelation")
        ).collect { case (f, true) => f }
        if (flags.nonEmpty) println(s"=== $name: ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"=== $name: ERROR $e") }
    }
    println("=== audit done")
    spark.stop()
  }
}
