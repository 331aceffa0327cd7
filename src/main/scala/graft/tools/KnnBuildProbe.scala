package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off diagnostic: times the exact k-NN graph build at a given SF dir
  * under the bench rig's configs and prints the formatted plan — used to
  * localize the round-12 single-task sort straggler. */
object KnnBuildProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.operators.SimSearch.knnGraph(spark, d, k = 1)
    g.explain("formatted")
    val t0 = System.nanoTime()
    println(s"rows: ${g.count()}")
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
