package graft.mr

import org.apache.spark.sql.SparkSession

/** JSON job-spec entry point — the engine analog of the reference's full
  * job lifecycle (SURVEY.md §3 E1): the client's spec
  * (/root/reference/client/mr_spec.json:1-11, MapReduceSpec at
  * cmd/master/master_utils.go:21-30) drives scan → script map → hash
  * partition into R → per-partition sort → script reduce → text sink,
  * returning the produced part files like the master returns blob names
  * (cmd/master/http_server.go:46-57).
  *
  * Field mapping (same spec shape, object-store plumbing dropped):
  *  - InputFilesDir  → the text-scan glob (ContainerName is the blob-store
  *    address of the same bytes — one path here)
  *  - NumMapTasks    → EXACT-M byte-range shards via [[ByteShards]]
  *    (round 4; the reference packs byte ranges into exactly M shards,
  *    mr_master.go:152-217 — previously this field was an advisory
  *    minPartitions, the one accepted lifecycle deviation). One Spark
  *    partition per packed shard; merged output stays partition-invariant
  *    (MRLawsSpec), and ByteShardsSpec asserts packing + line-alignment
  *    parity for arbitrary M
  *  - NumReduceTasks → R, the partitionSort bucket count
  *  - MapperFunc / ReducerFunc → script commands (run via python3 like the
  *    reference's exec, azure_util.go:158-165)
  *  - UserID/JobID   → output naming only; Url/etcd/gRPC → subsumed by the
  *    Spark scheduler (SURVEY §7 non-goals)
  */
final case class MRSpec(
    userId: String,
    jobId: Int,
    inputFilesDir: String,
    outputFilesDir: String,
    numMapTasks: Int,
    numReduceTasks: Int,
    mapperFunc: String,
    reducerFunc: String)

object MRSpec {

  /** Parse the reference's spec JSON (same field names; Jackson is on the
    * Spark classpath). Unknown fields (Url, ContainerName) are ignored. */
  def fromJson(json: String): MRSpec = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def str(f: String, dflt: String = ""): String =
      Option(m.get(f)).map(_.asText).getOrElse(dflt)
    def int(f: String, dflt: Int): Int =
      Option(m.get(f)).map(_.asInt).getOrElse(dflt)
    MRSpec(
      userId = str("UserID", "user"),
      jobId = int("JobID", 0),
      inputFilesDir = str("InputFilesDir"),
      outputFilesDir = str("OutputFilesDir"),
      numMapTasks = int("NumMapTasks", 0),
      numReduceTasks = int("NumReduceTasks", 1),
      mapperFunc = str("MapperFunc"),
      reducerFunc = str("ReducerFunc"))
  }

  def fromJsonFile(path: String): MRSpec =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Run the spec end-to-end; returns the output part-file paths (the
    * engine's `{UserID}_j{JobID}_r{i}` analog is `part-0000i` under
    * `{outputFilesDir}/{UserID}_j{JobID}`). */
  def run(spark: SparkSession, spec: MRSpec): Seq[String] = {
    val in = new java.io.File(spec.inputFilesDir)
    val paths: Seq[String] =
      if (in.isDirectory) in.listFiles().filter(_.isFile).map(_.getPath).sorted.toSeq
      else Seq(spec.inputFilesDir)
    val lines =
      if (spec.numMapTasks > 0) ByteShards.lines(spark, paths, spec.numMapTasks)
      else MRJob.text(spark, paths: _*)
    val outDir = s"${spec.outputFilesDir}/${spec.userId}_j${spec.jobId}"
    MRJob.mapScript(lines, Seq("python3", spec.mapperFunc))
      .partitionSort(spec.numReduceTasks)
      .reduceScript(Seq("python3", spec.reducerFunc))
      .saveText(outDir)
    val produced = new java.io.File(outDir).listFiles()
    produced.filter(f => f.getName.startsWith("part-")).map(_.getPath).sorted.toSeq
  }
}
