package graft.mr

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

/** Generic MapReduce substrate with direct parity to the reference
  * (SURVEY.md §2.3 A): sharded text scan → flatMap mapper (native or
  * external script) → hash partition on key into R buckets → per-partition
  * sort → sorted-stream reducer (native or external script) → text sink.
  *
  * Spark realization choices:
  *  - the scan is `spark.read.textFile` — identical split-alignment
  *    semantics to the reference's byte-range sharder + skip-first-line
  *    reader (/root/reference/cmd/master/mr_master.go:152-217,
  *    cmd/azure/azure_util.go:196-218), for free;
  *  - script stages use RDD `pipe` — the same streaming child-process
  *    contract as the reference's `exec python3 -c` + stdin feeder
  *    (cmd/azure/azure_util.go:158-226), and the one place the RDD API is
  *    genuinely the right layer (opaque user code, per-partition
  *    imperative I/O);
  *  - the shuffle+sort is `repartitionAndSortWithinPartitions` with a
  *    `HashPartitioner(R)` — one shuffle that both partitions and sorts,
  *    matching the reference's FNV-hash bucket write + reduce-side
  *    `sort.Strings` (azure_util.go:263-267, mr_worker.go:202). Partition
  *    *assignment* parity with FNV is an explicit non-goal (SURVEY §7
  *    risks): merged results are partition-invariant, which the
  *    MRJobSpec (R=3 vs R=7) and MRLawsSpec (merged reduce output
  *    independent of R) tests assert;
  *  - unlike the reference's in-memory reducer buffer (mr_worker.go:168-209),
  *    Spark's sort-based shuffle spills — this runs at 100 TB where the
  *    reference OOMs.
  *
  * The native reduce path (`reduceByKey`-style) additionally enables
  * map-side partial aggregation, which the reference's combiner-less
  * design cannot express.
  */
object MRJob {

  /** Sharded text scan (reference O1/O2). */
  def text(spark: SparkSession, paths: String*): Dataset[String] =
    spark.read.textFile(paths: _*)

  /** A keyed intermediate dataset: the `key \t value` stream after the map
    * phase, before the shuffle. */
  final case class Keyed(spark: SparkSession, rdd: RDD[(String, String)]) {

    /** Hash partition by key into R buckets and sort each bucket —
      * reference O4+O5+O6 in a single Spark shuffle. Sort key is the whole
      * (key, value) line in lexicographic order, byte-matching the
      * reference's whole-line `sort.Strings`. */
    def partitionSort(r: Int): Keyed = {
      implicit val ord: Ordering[(String, String)] =
        Ordering.Tuple2(Ordering.String, Ordering.String)
      val keyedByLine = rdd.map { case (k, v) => ((k, v), ()) }
      val part = new HashPartitioner(r) {
        override def getPartition(key: Any): Int =
          super.getPartition(key.asInstanceOf[(String, String)]._1)
      }
      Keyed(spark, keyedByLine.repartitionAndSortWithinPartitions(part)
        .map { case ((k, v), _) => (k, v) })
    }

    /** Native sorted-stream reducer (reference O7): f(key, values) is fed
      * consecutive-equal-key runs, exactly the `itertools.groupby` contract
      * of client/scripts/reducer.py:21. Caller must have partitionSort'd. */
    def reduceNative(f: (String, Iterator[String]) => Iterator[(String, String)]): Keyed =
      Keyed(spark, rdd.mapPartitions { it =>
        new Iterator[Iterator[(String, String)]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[(String, String)] = {
            val key = buf.head._1
            val values = scala.collection.mutable.ArrayBuffer.empty[String]
            while (buf.hasNext && buf.head._1 == key) values += buf.next()._2
            f(key, values.iterator)
          }
        }.flatten
      })

    /** External-script reducer (reference O7, byte-level parity): pipes the
      * sorted `key\tvalue` lines through `cmd` stdin, parses stdout lines
      * back as tab-KV, dropping malformed lines like reducer.py:25-27. */
    def reduceScript(cmd: Seq[String]): Keyed =
      Keyed(spark, rdd.map(KVCodec.encode).pipe(cmd).flatMap(KVCodec.decode(_)))

    /** Shuffle-free aggregation upgrade the reference cannot express:
      * map-side partial combine (reference shuffles one line per token). */
    def reduceByKey(f: (String, String) => String): Keyed =
      Keyed(spark, rdd.reduceByKey(f))

    /** Reference O8 text sink: one `key\tvalue` line per record, one file
      * per partition, each file internally sorted iff partitionSort ran. */
    def saveText(dir: String): Unit = {
      import spark.implicits._
      spark.createDataset(rdd.map(KVCodec.encode))
        .write.mode(SaveMode.Overwrite).text(dir)
    }

    def toDF(keyName: String = "key", valueName: String = "value") = {
      import spark.implicits._
      rdd.toDF(keyName, valueName)
    }
  }

  /** Native mapper (reference O3, in-JVM form): flatMap of a line to
    * zero-or-more KV pairs. */
  def mapNative(lines: Dataset[String])(f: String => IterableOnce[(String, String)]): Keyed =
    Keyed(lines.sparkSession, lines.rdd.flatMap(f))

  /** External-script mapper (reference O3, byte-level parity): pipes raw
    * input lines through `cmd`; stdout lines are parsed as tab-KV.
    * Input order within a partition is preserved (stronger than the
    * reference, whose per-shard goroutines interleave nondeterministically
    * — SURVEY §2.1 quirks — so any script correct there is correct here). */
  def mapScript(lines: Dataset[String], cmd: Seq[String]): Keyed =
    Keyed(lines.sparkSession, lines.rdd.pipe(cmd).flatMap(KVCodec.decode(_)))
}
