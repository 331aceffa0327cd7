package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: print the executed plan of one declared query.
  * Usage: runMain graft.tools.PlanProbe <queryName> [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println("=== EXECUTED PLAN: " + name + " ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
