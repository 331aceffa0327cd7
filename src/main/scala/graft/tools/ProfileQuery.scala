package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool (guide §1): runs one declared
  * query N times under a SparkListener that records every job's wall
  * time and description, so per-query cost decomposes into its actions
  * (collects, localCheckpoints, the final noop write) instead of one
  * opaque number. Warm rep = last rep (artifacts built, codegen hot).
  *
  * Usage: sbt "runMain graft.tools.ProfileQuery <key> [reps]"
  *   (env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench)
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.CopyOnWriteArrayList[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          jobs.add((je.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
      }
    })
    for (k1 <- key.split(",").toSeq) {
      val fn = graft.SparkEntry.queries(k1)
      for (r <- 1 to reps) {
        jobs.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment before printing
        Thread.sleep(500)
        import scala.jdk.CollectionConverters._
        val js = jobs.asScala.toSeq.sortBy(_._1)
        val inJobs = js.map(_._2).sum
        println(f"== rep $r: $k1 total $dt%.3f s, ${js.size} jobs, $inJobs%.3f s in jobs ==")
        if (r == reps) js.foreach { case (id, t, desc) =>
          println(f"  job $id%4d  $t%7.3f s  ${desc.take(110)}")
        }
      }
    }
    try graft.core.SessionArtifacts.clear(spark)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
