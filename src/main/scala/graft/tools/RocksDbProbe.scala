package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical probe: does the RocksDB state-store provider actually run in
  * this environment? Runs one watermarked windowed agg over the staged
  * stream with the provider forced on and prints the state-store custom
  * metrics from the last progress (rocksdb* keys appear ONLY when the
  * RocksDB provider executed). */
object RocksDbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
    // stage a 2-slice copy inline (avoid touching Streams' private staging);
    // normalize through Tables.events and slice on epoch-micros BIGINT
    val dir = java.nio.file.Files.createTempDirectory("graft_rocks_probe")
    val raw = graft.core.Tables.events(spark, d)
      .withColumn("ts", unix_micros(col("ts")))
    val mid = raw.stat.approxQuantile("ts", Array(0.5), 0.001)(0).toLong
    raw.where(col("ts") < mid).coalesce(1).write.parquet(s"$dir/a")
    raw.where(col("ts") >= mid).coalesce(1).write.parquet(s"$dir/b")
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").parquet(dir.toString)
      .withColumn("ts", timestamp_micros(col("ts")))
    val agg = src.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName("rocks_probe").start()
    q.processAllAvailable()
    val prog = q.lastProgress
    q.stop()
    val metrics = prog.stateOperators.apply(0).customMetrics
    val keys = metrics.keySet().toArray.map(_.toString).sorted
    println(s"PROBE batches=${prog.batchId + 1} rows=${spark.table("rocks_probe").count()}")
    println(s"PROBE rocksdbMetricCount=${keys.count(_.startsWith("rocksdb"))}")
    println(keys.filter(_.startsWith("rocksdb")).take(5).mkString("PROBE keys: ", ", ", ""))
    spark.stop()
  }
}
