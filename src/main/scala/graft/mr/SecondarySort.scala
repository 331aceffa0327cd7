package graft.mr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Secondary sort — the canonical MapReduce pattern the reference's
  * whole-line sort provides implicitly: because the reduce-side sort
  * orders entire `key\tvalue` lines (`sort.Strings`,
  * /root/reference/cmd/worker/mr_worker.go:202), a reducer's values
  * arrive sorted WITHIN each key, and scripts like
  * client/scripts/reducer.py silently depend on exactly that for their
  * groupby contract. This job makes the dependency explicit and
  * VERIFIED: a per-user event-log reduction whose value encoding
  * (zero-padded epoch-µs ‖ type ‖ event_id) makes lexicographic order =
  * time order, and whose reducer ASSERTS monotone value arrival (a
  * violated sorted-stream contract throws, failing the job) while
  * computing first event, last event, and count in O(1) memory — no
  * reducer-side buffering or re-sort, which is the entire point of
  * secondary sort at 100 TB (values per key can exceed reducer memory;
  * the shuffle's sort machinery — which spills — does the ordering).
  *
  * Engine realization: [[MRJob.partitionSort]] already sorts (key,
  * value) tuples, i.e. Spark's `repartitionAndSortWithinPartitions` is
  * the composite-key secondary sort; this query is its first consumer
  * whose CORRECTNESS (not just byte-parity) rides on the value order. */
object SecondarySort {

  def onEvents(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the "log line" staging: one space-separated line per event, the
    // textbook input shape of a secondary-sort log job
    val lines = graft.core.Tables.events(s, d)
      .select(concat_ws(" ", $"user_id", unix_micros($"ts"), $"event_type",
        $"event_id").as("line"))
      .as[String]
    MRJob.mapNative(lines) { line =>
      val f = line.split(" ")
      // zero-padded µs makes lexicographic order numeric; type+id break
      // same-µs ties with a unique total order
      Seq((f(0), f"${f(1).toLong}%020d" + "_" + f(2) + "_" + f(3)))
    }
      .partitionSort(8)
      .reduceNative { (user, values) =>
        var first: String = null
        var last: String = null
        var prev: String = null
        var n = 0L
        values.foreach { v =>
          if (prev != null && v < prev)
            throw new IllegalStateException(
              s"sorted-stream contract violated for user $user: $v arrived after $prev")
          prev = v
          if (first == null) first = v
          last = v
          n += 1
        }
        Iterator((user, s"$first|$last|$n"))
      }
      .toDF("key", "value")
  }

  val oracle: Map[String, String] = Map(
    "mr_secondary_sort" -> """
      WITH v AS (
        SELECT user_id,
               printf('%020d', epoch_us(CAST(ts AS TIMESTAMP))) || '_' ||
                 event_type || '_' || CAST(event_id AS VARCHAR) AS val
        FROM events)
      SELECT CAST(user_id AS VARCHAR) AS key,
             min(val) || '|' || max(val) || '|' || CAST(count(*) AS VARCHAR) AS value
      FROM v GROUP BY user_id"""
  )
}
