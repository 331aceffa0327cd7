package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Measurement probe for the fuzzy join's candidate pipeline: pair
  * counts and stage timings at a given SF dir. */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val (probes, cands) = Relational.fuzzyFrames(spark, d)
    println(s"probes=${probes.count()} cands=${cands.count()}")
    val c = Relational.fuzzyCandidates(probes, cands)
    time("candidates (cold)")(println(s"pairs=${c.count()}"))
    time("candidates (warm)")(c.count())
    val full = Relational.joinFuzzyEditdist(spark, d)
    time("full query (cold)")(println(s"rows=${full.count()}"))
    time("full query (warm)")(Relational.joinFuzzyEditdist(spark, d).count())
    spark.stop()
  }
}
