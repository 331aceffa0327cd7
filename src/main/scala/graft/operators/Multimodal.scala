package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing (SURVEY.md §2.3 J / builder north star):
  * media payloads ride as opaque `binary` columns with typed metadata
  * alongside. The container has no image/audio codecs, so the decode
  * kernel is a clearly-marked deterministic STUB — but everything Spark
  * cares about is real: schema, batch shape, partition-parallel execution,
  * and the metadata extraction path.
  *
  * At 100 TB: binary payloads stay columnar in parquet (no base64 blowup),
  * decode runs `mapPartitions`-batched per executor core exactly like a
  * vectorized Python `mapInPandas` stage would, and metadata predicates
  * (size, type) push down without touching payload bytes.
  */
object Multimodal {

  /** Byte length of a batch the stub "decoder" processes at once —
    * mirrors a real vectorized decode (e.g. arrow batches into a codec). */
  val DecodeBatchSize = 64

  /** Metadata extraction over an opaque binary media column: byte length,
    * content digest, and deterministic fake dimensions (in a real pipeline
    * these come from the container header — same plumbing, real decode).
    * The fixture's `text` column stands in as the payload bytes. */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .select(
        $"doc_id",
        octet_length($"media").cast("bigint").as("n_bytes"),
        sha2($"media", 256).as("digest"),
        ((octet_length($"media") % 64) * 16 + 16).cast("bigint").as("fake_width"),
        ((floor(octet_length($"media") / 64) % 64) * 16 + 16).cast("bigint").as("fake_height"),
        (octet_length($"media") % 30 + 1).cast("bigint").as("fake_frames"))
  }

  /** Case classes defining the decode stage's typed schema. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class DecodedRow(doc_id: Long, n_bytes: Int, features: Array[Double])

  /** STUB decode kernel: a real implementation would hand `bytes` to a
    * codec (JPEG/FLAC/MP4) and emit pixels/samples/frames. Here it emits
    * an 8-dim "feature" = evenly-sampled byte values — deterministic, so
    * the full distributed path is testable end-to-end. */
  def stubDecode(bytes: Array[Byte]): Array[Double] = {
    val n = bytes.length
    Array.tabulate(8)(j => if (n == 0) 0.0 else (bytes(math.min(j * n / 8, n - 1)) & 0xff).toDouble)
  }

  /** Batched decode over partitions: groups each partition's rows into
    * [[DecodeBatchSize]] batches (the shape a vectorized decoder wants),
    * decodes, re-flattens. Partition-parallel, streaming, constant memory. */
  def decodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          // one "codec call" per batch — the real version would decode the
          // whole batch in native code / arrow
          batch.map(r => DecodedRow(r.doc_id, r.media.length, stubDecode(r.media)))
        }
      }
      .select(Seq($"doc_id", $"n_bytes".cast("bigint").as("n_bytes")) ++
        (0 until 8).map(j => element_at($"features", j + 1).as(s"f$j")): _*)
  }

  /** STUB "resize": block-mean downsample of the payload bytes to 4
    * fixed buckets — the shape of an image resize kernel (average
    * pooling), batched per partition like [[decodeFeatures]]. Block b of
    * a len-byte payload covers bytes i with (i*4)/len == b. */
  def resizeBlocks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap(_.map { r =>
          val n = r.media.length
          val sums = new Array[Double](4)
          val counts = new Array[Long](4)
          var i = 0
          while (i < n) {
            val b = (i.toLong * 4 / n).toInt
            sums(b) += (r.media(i) & 0xff)
            counts(b) += 1
            i += 1
          }
          DecodedRow(r.doc_id, n,
            Array.tabulate(4)(b => if (counts(b) == 0) 0.0 else sums(b) / counts(b)))
        })
      }
      .select(Seq($"doc_id", $"n_bytes".cast("bigint").as("n_bytes")) ++
        (0 until 4).map(b => round(element_at($"features", b + 1), 4).as(s"b$b")): _*)
  }

  /** STUB "frame sampling": treat the payload as fixed 32-byte frames and
    * keep every 4th frame's first byte — the strided frame-select shape of
    * video pipelines (one output row per kept frame: doc_id, frame_no,
    * lead byte code). Pure per-row explode — shuffle-free. ($"text" in the
    * lambda is an attribute read, not a recomputed expression — cheap.) */
  def sampleFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hop = 32 * 4 // frame size 32 bytes, keep every 4th frame
    Tables.documents(s, d)
      .where(length($"text") >= 1)
      .select($"doc_id",
        posexplode(transform(
          sequence(lit(0), floor((length($"text") - 1) / hop).cast("int")),
          f => ascii($"text".substr(f * hop + 1, lit(1))).cast("bigint"))).as(Seq("frame_no", "lead_byte")))
      .select($"doc_id", $"frame_no".cast("bigint").as("frame_no"), $"lead_byte")
  }

  val oracle: Map[String, String] = Map(
    "mm_resize" -> ("""
      SELECT doc_id, length(text) AS n_bytes, """ +
      (0 until 4).map(b =>
        s"round(avg(CASE WHEN ((i - 1) * 4) // length(text) = $b THEN ascii(substr(text, CAST(i AS INT), 1)) END), 4) AS b$b")
        .mkString(", ") + """
      FROM documents JOIN generate_series(1, 8192) g(i) ON i <= length(text)
      GROUP BY doc_id, length(text)"""),

    "mm_frames" -> """
      SELECT doc_id, (i - 1) // 128 AS frame_no,
             ascii(substr(text, CAST(i AS INT), 1)) AS lead_byte
      FROM documents JOIN generate_series(1, 8192) g(i)
        ON i <= length(text) AND (i - 1) % 128 = 0""",

    "mm_meta" -> """
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             sha256(text) AS digest,
             (octet_length(encode(text)) % 64) * 16 + 16 AS fake_width,
             ((octet_length(encode(text)) // 64) % 64) * 16 + 16 AS fake_height,
             octet_length(encode(text)) % 30 + 1 AS fake_frames
      FROM documents""",
    // decode stub oracle: features are evenly-sampled byte codes (ASCII
    // corpus: byte == char code)
    "mm_decode" -> ("""
      SELECT doc_id, length(text) AS n_bytes, """ +
      (0 until 8).map(j =>
        s"CAST(ascii(substr(text, least(($j * length(text)) // 8, length(text) - 1) + 1, 1)) AS DOUBLE) AS f$j")
        .mkString(", ") + """
      FROM documents""")
  )
}
