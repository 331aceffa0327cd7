package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Memory-pressure probe (round-8 verdict item): execute the heaviest
  * declared operators under a DELIBERATELY constrained memory budget and
  * report the spill the engine actually performed — converting the
  * "Spark adds spill for free" prose (SURVEY §2.1 O6) into measured
  * evidence. Two knobs compose the pressure:
  *
  *  - SPARK_DRIVER_MEM (build.sbt forked-JVM -Xmx, e.g. 2g) bounds the
  *    whole JVM;
  *  - SPARK_GRAFT_MEMFRAC (spark.memory.fraction, e.g. 0.05) shrinks the
  *    unified execution+storage region inside it, which is what actually
  *    pushes sorts/aggregations/joins past their in-memory budget at
  *    test SF — the same condition a 100 TB shuffle partition hits when
  *    it outgrows an executor's share.
  *
  * A SparkListener sums task-level memoryBytesSpilled / diskBytesSpilled
  * and max-tracks peakExecutionMemory between per-query marks. Output:
  * one JSON line per query (spills, peak, wall time, result rows>0) and
  * a trailing summary line. A query that OOMs or errors prints an "err"
  * line and exits nonzero — an operator that cannot complete under
  * pressure is a bug to fix, not a number to record.
  *
  * Usage: SPARK_DRIVER_MEM=2g SPARK_GRAFT_MEMFRAC=0.05 \
  *   sbt "runMain graft.tools.SpillProbe" [query names...]
  */
object SpillProbe {
  private val DefaultQueries = Seq(
    "dedup_minhash", "dedup_containment", "dedup_ngram_jaccard",
    "dedup_semantic", "simsearch_knn_graph", "sort_global",
    "sql_q9_profit", "sql_q21_waiting", "text_dup_passages", "agg_listagg",
    "mr_secondary_sort", "sql_percentile_disc")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val memFrac = sys.env.getOrElse("SPARK_GRAFT_MEMFRAC", "0.05")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val names = if (args.nonEmpty) args.toSeq else DefaultQueries
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the pressure knob: a tiny unified region forces the spill paths
      // (ExternalSorter, UnsafeExternalSorter, ObjectAggregation fallback)
      // that a 128 GiB test box otherwise never exercises
      .config("spark.memory.fraction", memFrac)
      // optional: shrink task page size to probe how much of the floor is
      // page-granularity (SPARK_GRAFT_PAGESIZE bytes; unset = Spark auto)
      .config(sys.env.get("SPARK_GRAFT_PAGESIZE")
        .map(p => Map("spark.buffer.pageSize" -> p)).getOrElse(Map.empty[String, String]))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val peakExec = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakExec.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"""{"probe":"spill","sf":"$sfDir","heap_mb":$heapMb,"memory_fraction":$memFrac,"cpus":$cpus}""")

    var failed = false
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"""{"query":"$name","err":"unknown query"}"""); failed = true
        case Some(fn) =>
          memSpill.set(0L); diskSpill.set(0L); peakExec.set(0L)
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            val secs = (System.nanoTime() - t0) / 1e9
            // listener events are posted asynchronously (the bus is
            // private[spark], so waitUntilEmpty is unreachable): poll until
            // the counters are stable across two consecutive 200 ms reads.
            // A fixed sleep under-attributes a spill-heavy query whose last
            // TaskEnd events trail the action by more than the sleep — they
            // would land after the reset and corrupt the NEXT query's line.
            var settle = 0
            var last = (-1L, -1L, -1L)
            while (settle < 25 && // 5 s cap: a dead-quiet bus exits in 400 ms
                   last != ((memSpill.get, diskSpill.get, peakExec.get))) {
              last = (memSpill.get, diskSpill.get, peakExec.get)
              Thread.sleep(200)
              settle += 1
            }
            println(f"""{"query":"$name","mem_spill_mb":${memSpill.get / 1e6}%.1f,"disk_spill_mb":${diskSpill.get / 1e6}%.1f,"peak_exec_mb":${peakExec.get / 1e6}%.1f,"sec":$secs%.2f}""")
          } catch {
            case e: Throwable =>
              failed = true
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(160)
                .replace("\"", "'").map(c => if (c < ' ') ' ' else c)
              println(s"""{"query":"$name","err":"$msg"}""")
          }
      }
    }
    // sweep session-scoped artifact dirs/caches before exit: the
    // in-session memo bounding caps live copies at one per call-site,
    // and this drops that last copy so a finished run leaves no temp
    // residue behind (best-effort — a kill-9 leaves the final set)
    try graft.core.SessionArtifacts.clear(spark)
    catch { case _: Throwable => () }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
