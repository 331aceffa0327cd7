package graft.tools

import org.apache.spark.{SparkContext, TaskContext}
import org.apache.spark.sql.SparkSession

/** Fault-tolerance parity check — the engine analog of the reference's
  * chaos testing (SURVEY.md §5.1 / O15: FAIL=n deployments where a worker
  * `os.Exit(0)`s mid-task and the job must still produce the golden
  * output, kubernetes/worker-failure-deployment.yaml:32-33).
  *
  * Spark's unit of recovery is the task attempt, not the process: every
  * map task here THROWS on its first attempt (the moral equivalent of the
  * reference's worker dying before finishing its n-th task) and succeeds
  * on retry; `local[4, 2]` gives the scheduler 2 attempts per task, like
  * the reference's infinite-retry loop (mr_master.go:264-304) but
  * bounded. The job must complete and produce exactly the failure-free
  * result. Runs in its own JVM (task retries are a context-level setting
  * the shared test session can't adopt); ChaosSpec drives it and asserts
  * the CHAOS OK line.
  */
object ChaosCheck {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4, 2]") // 2 attempts per task
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val lines = graft.core.Tables.documents(spark, d).select("text").as[String]

    def wordcount(chaos: Boolean): Map[String, Long] = {
      val src = if (!chaos) lines else lines.mapPartitions { it =>
        if (TaskContext.get().attemptNumber() == 0)
          sys.error("injected chaos: first attempt dies mid-task")
        it
      }
      graft.mr.MRJob
        .mapNative(src)(l =>
          graft.mr.WordCount.TokenPattern.r.findAllIn(l.toLowerCase).map(w => (w, "1")))
        .partitionSort(4)
        .reduceNative((k, vs) => Iterator((k, vs.map(_.toLong).sum.toString)))
        .rdd.collect().toMap.map { case (k, v) => k -> v.toLong }
    }

    val clean = wordcount(chaos = false)
    val chaosed = wordcount(chaos = true)
    if (clean == chaosed && clean.nonEmpty) {
      println(s"CHAOS OK: ${clean.size} distinct words, results identical under task-failure injection")
      spark.stop()
    } else {
      println(s"CHAOS FAILED: clean=${clean.size} chaos=${chaosed.size}")
      spark.stop()
      sys.exit(1)
    }
  }
}
