package graft.mr

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Reference-parity byte-range sharder — the exact-M packing of
  * /root/reference/cmd/master/mr_master.go:152-217 plus the split-aligned
  * line reader of cmd/azure/azure_util.go:196-218, realized as one Spark
  * partition per shard.
  *
  * [[MRJob.text]] (`spark.read.textFile`) remains the scale path: Spark's
  * `FilePartition` packing is the same greedy byte-budget algorithm keyed
  * by `maxPartitionBytes` instead of M. What it cannot promise is an
  * EXACT task count — `minPartitions` is advisory — and the reference's
  * contract is "exactly M map tasks over byte ranges". This class closes
  * that accepted deviation for the job-spec lifecycle ([[MRSpec]]):
  *
  *  - stat input files, sort ascending by size (mr_master.go:155-157).
  *    The reference's sort.Slice is UNSTABLE, so its order among
  *    equal-size files is nondeterministic; here ties break by path, so
  *    packing is OUTPUT-EQUIVALENT to a valid reference packing (same
  *    shard count, same per-shard byte totals) with a deterministic tie
  *    order rather than byte-identical on every input. Zero-length files
  *    are dropped rather than packed as empty ranges (they contribute no
  *    lines either way);
  *  - shardSize = ceil(totalBytes / M) (mr_master.go:160-166);
  *  - greedy pack byte ranges: a shard may span multiple files and a file
  *    may span multiple shards (mr_master.go:172-209); resulting shard
  *    count is ceil(total / shardSize) ≤ M.
  *
  * Line alignment deliberately follows the Hadoop `TextInputFormat`
  * contract, NOT the reference's reader: a reader starting mid-file skips
  * through the first '\n' (its previous neighbor finishes that line by
  * reading PAST its own end), and every reader runs past its end boundary
  * to complete its final line — so the merged multiset of lines is exactly
  * the files' lines for any M. The reference reader (azure_util.go:196-218)
  * instead DROPS the partial line at a range end without any neighbor
  * completing it — a lossy boundary bug this class does not reproduce.
  *
  * Each range open/seek/read happens on the EXECUTOR via the Hadoop
  * FileSystem API, so the same code reads local disk, HDFS, or any
  * configured object store; the driver only stats sizes and packs ranges
  * (O(files), like the reference master).
  */
object ByteShards {

  /** Half-open byte range [start, end) of one file. */
  final case class Range(path: String, start: Long, end: Long)

  /** One map task's input: ranges over possibly many files. */
  final case class Shard(id: Int, ranges: Seq[Range])

  /** Exact reference packing over (path, sizeBytes) inputs. */
  def shardFiles(files: Seq[(String, Long)], m: Int): Seq[Shard] = {
    require(m > 0, s"NumMapTasks must be positive, got $m")
    val sorted = files.filter(_._2 > 0).sortBy { case (p, sz) => (sz, p) }
    val total = sorted.iterator.map(_._2).sum
    if (total == 0) return Seq.empty
    val shardSize = (total + m - 1) / m
    val shards = Seq.newBuilder[Shard]
    var cur = Seq.newBuilder[Range]
    var curBytes = 0L
    var id = 0
    sorted.foreach { case (p, sz) =>
      var off = 0L
      while (off < sz) {
        val take = math.min(sz - off, shardSize - curBytes)
        cur += Range(p, off, off + take)
        off += take
        curBytes += take
        if (curBytes == shardSize) {
          shards += Shard(id, cur.result()); id += 1
          cur = Seq.newBuilder[Range]; curBytes = 0L
        }
      }
    }
    val tail = cur.result()
    if (tail.nonEmpty) shards += Shard(id, tail)
    shards.result()
  }

  /** Sharded line scan with EXACTLY one Spark partition per packed shard.
    * Returns the same line multiset as `spark.read.textFile(paths)` for
    * any M (property-tested in ByteShardsSpec). The driver's Hadoop
    * configuration is shipped to the tasks so executor-side opens see the
    * same credentials / filesystem settings the driver statted with. */
  def lines(spark: SparkSession, paths: Seq[String], m: Int): Dataset[String] = {
    import scala.jdk.CollectionConverters._
    val hconf = spark.sparkContext.hadoopConfiguration
    val statted = paths.map { p =>
      val hp = new Path(p)
      p -> hp.getFileSystem(hconf).getFileStatus(hp).getLen
    }
    val shards = shardFiles(statted, m)
    if (shards.isEmpty)
      return spark.emptyDataset(Encoders.STRING)
    // Configuration is not serializable; ship its entries and rebuild
    val confEntries = hconf.iterator().asScala.map(e => (e.getKey, e.getValue)).toSeq
    val rdd = spark.sparkContext
      .parallelize(shards, shards.size) // one slice == one shard == one task
      .flatMap { sh =>
        val conf = new Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        sh.ranges.iterator.flatMap(r => readRange(r, conf))
      }
    spark.createDataset(rdd)(Encoders.STRING)
  }

  /** Split-aligned line read of one byte range (runs on the executor).
    * Line terminators match Hadoop's LineReader — LF, CRLF, or lone CR —
    * so the multiset parity with `textFile` holds for any input. The
    * stream is closed when the iterator drains AND on task completion
    * (a limit/early-abort must not leak the file handle). */
  private[mr] def readRange(r: Range, conf: Configuration): Iterator[String] = {
    val p = new Path(r.path)
    val fs = p.getFileSystem(conf)
    val raw = fs.open(p)
    raw.seek(r.start)
    val in = new java.io.BufferedInputStream(raw, 128 * 1024)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => try in.close() catch { case _: Exception => () }))
    var pos = r.start
    var eof = false

    // consume one full line incl. terminator (LF / CRLF / lone CR),
    // tracking the absolute byte position; sets eof on stream end
    def readLine(): String = {
      val buf = new java.io.ByteArrayOutputStream(256)
      var done = false
      while (!done) {
        val b = in.read()
        if (b < 0) { eof = true; done = true }
        else {
          pos += 1
          if (b == '\n') done = true
          else if (b == '\r') {
            in.mark(1)
            val nb = in.read()
            if (nb == '\n') pos += 1          // CRLF: consume both
            else if (nb >= 0) in.reset()      // lone CR terminates the line
            done = true
          } else buf.write(b)
        }
      }
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    }

    // mid-file start: the partial (or boundary-complete) first line belongs
    // to the neighbor that read past its end — skip through its terminator
    if (r.start != 0) readLine()

    new Iterator[String] {
      private var nextLine: String = null
      private var closed = false
      private def advance(): Unit = {
        // a line is ours iff it starts AT or before the end boundary
        // (pos <= end, the TextInputFormat rule): the next reader skips
        // its first line unconditionally, so the line starting exactly at
        // the boundary must be read by THIS side or it would be lost
        if (!closed && !eof && pos <= r.end) {
          nextLine = readLine()
          // EOF with an empty final fragment is not a line
          if (eof && nextLine.isEmpty) nextLine = null
        } else nextLine = null
        if (nextLine == null && !closed) { closed = true; in.close() }
      }
      advance()
      def hasNext: Boolean = nextLine != null
      def next(): String = { val l = nextLine; advance(); l }
    }
  }
}
