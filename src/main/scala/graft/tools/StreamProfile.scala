package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement tool: runs one streaming declared
  * query and prints every microbatch's durationMs breakdown
  * (queryPlanning / addBatch / walCommit / stateStoreCommit ...) from
  * the progress log — the decomposition the streaming family's fixed
  * cost hides. */
object StreamProfile {
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
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dm = p.durationMs.asScala.map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[batch ${p.batchId}] rows=${p.numInputRows} $dm")
      }
    }
    spark.streams.addListener(listener)
    val fn = graft.SparkEntry.queries(key)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"== rep $r: $key total ${(System.nanoTime() - t0) / 1e9}%.3f s ==")
    }
    try graft.core.SessionArtifacts.clear(spark)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
