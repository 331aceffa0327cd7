package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing (SURVEY.md §2.3 J / builder north star):
  * media payloads ride as opaque `binary` columns with typed metadata
  * alongside, and the decode/resize/meta kernels run a REAL image codec —
  * the JDK's built-in `javax.imageio` PNG reader/writer (zero external
  * dependencies). The fixture carries no media files, so the image is
  * synthesized IN-QUERY (the fuzzy-join typo-injection pattern): payload
  * bytes become the raster of an 8-bit grayscale PNG, width [[ImageW]],
  * row-major, zero-padded tail row. Grayscale PNG is lossless, so decoded
  * pixels equal payload bytes — a genuine DEFLATE encoder and decoder run
  * in the executor hot path while the DuckDB oracle replays the pixel
  * math analytically from the same bytes. (Round ≤5 shipped deterministic
  * stub kernels here; the codec round-trip retires that caveat. JPEG/
  * audio/video codecs remain absent from the container — PNG is the one
  * real codec the JDK ships.)
  *
  * At 100 TB: binary payloads stay columnar in parquet (no base64
  * blowup), decode runs `mapPartitions`-batched per executor core — ONE
  * codec call per [[DecodeBatchSize]] rows, the arrow-batch shape a
  * vectorized decoder wants — and metadata predicates (size, type) push
  * down without touching payload bytes.
  */
object Multimodal {

  /** Rows per codec call: each partition's rows are grouped into batches
    * of this size and every batch round-trips through the PNG codec as a
    * single concatenated image (mirrors vectorized arrow-batch decode). */
  val DecodeBatchSize = 64

  /** Fixed raster width of the synthesized grayscale image. */
  val ImageW = 64

  /** Bytes per "video frame" in the [[sampleFrames]] layout. */
  val FrameBytes = 32

  /** Encode payload bytes as an 8-bit grayscale PNG (width [[ImageW]],
    * row-major, zero-padded tail) via the JDK's ImageIO PNG writer. */
  def encodePng(bytes: Array[Byte]): Array[Byte] = {
    val w = ImageW
    val h = math.max(1, (bytes.length + w - 1) / w)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h,
      java.util.Arrays.copyOf(bytes, w * h))
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", out),
      "JDK PNG writer unavailable")
    out.toByteArray
  }

  /** Decode a PNG via ImageIO and return its raster bytes (row-major). */
  def decodePng(png: Array[Byte]): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    require(img != null, "JDK PNG reader unavailable")
    val (w, h) = (img.getWidth, img.getHeight)
    val pixels = new Array[Byte](w * h)
    img.getRaster.getDataElements(0, 0, w, h, pixels)
    pixels
  }

  /** Parse (width, height) from a PNG's IHDR chunk — real container-header
    * metadata extraction (bytes 16..23 after the 8-byte signature and the
    * IHDR length/tag, big-endian), the path a media pipeline uses to get
    * dimensions WITHOUT decoding pixels. */
  def parseIhdr(png: Array[Byte]): (Long, Long) = {
    require(png.length >= 24 &&
      (png(12) & 0xff) == 'I' && (png(13) & 0xff) == 'H', "not a PNG/IHDR")
    def be(i: Int): Long =
      ((png(i) & 0xffL) << 24) | ((png(i + 1) & 0xffL) << 16) |
        ((png(i + 2) & 0xffL) << 8) | (png(i + 3) & 0xffL)
    (be(16), be(20))
  }

  /** ONE codec call per batch: concatenate the batch's payloads, encode →
    * decode through the PNG codec, slice each row's pixels back out by
    * offset. Lossless grayscale ⇒ slice i equals payload i. */
  private def batchRoundTrip(payloads: Seq[Array[Byte]]): Seq[Array[Byte]] = {
    val total = payloads.iterator.map(_.length).sum
    val all = new Array[Byte](total)
    var off = 0
    payloads.foreach { p => System.arraycopy(p, 0, all, off, p.length); off = off + p.length }
    val pixels = decodePng(encodePng(all))
    off = 0
    payloads.map { p =>
      val slice = java.util.Arrays.copyOfRange(pixels, off, off + p.length)
      off += p.length
      slice
    }
  }

  /** Metadata extraction over an opaque binary media column: byte length,
    * content digest (SHA-256 of the raw payload), and REAL container
    * dimensions — each payload is laid out as its grayscale PNG and
    * width/height come from parsing the encoded container's IHDR header,
    * never from the payload length arithmetic the oracle uses (that
    * independence is the check). n_frames is the [[FrameBytes]]-frame
    * count of the video-layout view. */
  def mediaMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        val sha = java.security.MessageDigest.getInstance("SHA-256")
        it.map { r =>
          val (w, h) = parseIhdr(encodePng(r.media))
          val digest = sha.digest(r.media).map("%02x".format(_)).mkString
          sha.reset()
          MetaRow(r.doc_id, r.media.length.toLong, digest, w, h,
            (r.media.length.toLong + FrameBytes - 1) / FrameBytes)
        }
      }
      .toDF()
  }

  /** Case classes defining the kernels' typed schemas. */
  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class DecodedRow(doc_id: Long, n_bytes: Int, features: Array[Double])
  final case class MetaRow(doc_id: Long, n_bytes: Long, digest: String,
    width: Long, height: Long, n_frames: Long)

  /** 8-dim feature = evenly-sampled pixel values of the decoded raster. */
  private def sampleFeatures(px: Array[Byte]): Array[Double] = {
    val n = px.length
    Array.tabulate(8)(j => if (n == 0) 0.0 else (px(math.min(j * n / 8, n - 1)) & 0xff).toDouble)
  }

  /** Batched REAL decode over partitions: each [[DecodeBatchSize]] batch
    * round-trips through the PNG codec once ([[batchRoundTrip]]), then
    * per-row features sample the decoded raster. Partition-parallel,
    * streaming, constant memory. */
  def decodeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batchRoundTrip(batch.map(_.media)).lazyZip(batch).map((px, r) =>
            DecodedRow(r.doc_id, px.length, sampleFeatures(px)))
        }
      }
      .select(Seq($"doc_id", $"n_bytes".cast("bigint").as("n_bytes")) ++
        (0 until 8).map(j => element_at($"features", j + 1).as(s"f$j")): _*)
  }

  /** REAL resize: average-pool the DECODED raster down to 4 fixed blocks
    * (block b covers pixels i with (i*4)/len == b) — the shape of an
    * image resize kernel, run on codec output, batched like
    * [[decodeFeatures]]. */
  def resizeBlocks(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batchRoundTrip(batch.map(_.media)).lazyZip(batch).map { (px, r) =>
            val n = px.length
            val sums = new Array[Double](4)
            val counts = new Array[Long](4)
            var i = 0
            while (i < n) {
              val b = (i.toLong * 4 / n).toInt
              sums(b) += (px(i) & 0xff)
              counts(b) += 1
              i += 1
            }
            DecodedRow(r.doc_id, n,
              Array.tabulate(4)(b => if (counts(b) == 0) 0.0 else sums(b) / counts(b)))
          }
        }
      }
      .select(Seq($"doc_id", $"n_bytes".cast("bigint").as("n_bytes")) ++
        (0 until 4).map(b => round(element_at($"features", b + 1), 4).as(s"b$b")): _*)
  }

  /** Perceptual average-hash (aHash) of each image — the image-dedup
    * primitive every multimodal curation pipeline runs before training
    * (near-identical crops/re-encodes collide; the 64-bit hashes then
    * feed the SAME banding machinery the text SimHash path uses). The
    * decoded raster ([[ImageW]]-wide row-major) is average-pooled onto
    * an 8×8 grid and each cell thresholds against the global mean —
    * computed as EXACT integer cross-multiplication (cell_sum × n >
    * total × cell_count), so unequal cell sizes on a ragged final row
    * need no float division and the 64-bit result replays bitwise
    * (bit 63 rides the sign, same two's complement both engines). Runs
    * on REAL codec output (PNG round-trip, batched one codec call per
    * [[DecodeBatchSize]] rows); the oracle replays the pooling from the
    * payload bytes — lossless grayscale PNG makes raster == payload,
    * so codec-vs-arithmetic agreement is the check, the
    * [[decodeFeatures]] discipline. Per-row map, no shuffle. */
  def imagePhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batchRoundTrip(batch.map(_.media)).lazyZip(batch).map { (px, r) =>
            val n = px.length
            var hash = 0L
            if (n > 0) {
              val h = (n + ImageW - 1) / ImageW
              val sums = new Array[Long](64)
              val cnts = new Array[Long](64)
              var i = 0
              while (i < n) {
                val blk = ((i / ImageW).toLong * 8 / h).toInt * 8 + (i % ImageW) / 8
                sums(blk) += (px(i) & 0xff)
                cnts(blk) += 1
                i += 1
              }
              var total = 0L
              var bi = 0
              while (bi < 64) { total += sums(bi); bi += 1 }
              bi = 0
              while (bi < 64) {
                if (cnts(bi) > 0 && sums(bi) * n > total * cnts(bi))
                  hash |= (1L << bi)
                bi += 1
              }
            }
            PhashRow(r.doc_id, n.toLong, hash)
          }
        }
      }
      .select($"doc_id", $"n_pixels", $"phash")
  }

  final case class PhashRow(doc_id: Long, n_pixels: Long, phash: Long)

  /** Band-bucket population cap for [[phashDedup]] — the SSJoin skew
    * guard ([[Dedup.ContainDfCap]] precedent): a (band, 16-bit key)
    * bucket holding more than this many docs is dropped from the join.
    * Hot phash buckets are DEGENERATE rasters (near-constant images —
    * on the synthetic fixture one band key collects 14k of 50k docs,
    * 98M candidate pairs on its own, measured in SCALE.md), and pairing
    * them is quadratic noise, not near-dup signal. Per-task pair work
    * is bounded at cap²/2 ≈ 32k regardless of corpus size. */
  val PhashBucketCap = 256

  /** Image NEAR-DUP pairs from the perceptual hashes — the promised
    * completion of [[imagePhash]]'s pipeline ("the hashes feed the SAME
    * banding machinery the text SimHash path uses"): 64-bit aHash →
    * 4 × 16-bit bands → population-capped band-bucket EQUI-join
    * (candidates are bucket-local, never all-pairs) → exact hamming
    * verify at τ = 3. τ = bands − 1 makes the banding lossless by
    * pigeonhole (≤ 3 differing bits cannot touch all 4 bands) UP TO the
    * cap: a qualifying pair is emitted unless EVERY band it agrees on
    * is hotter than [[PhashBucketCap]] — the declared contract, stated
    * identically by the oracle (exhaustive pair enumeration + an
    * agreeing-cold-band EXISTS), so the gate still hash-compares the
    * full set algebra. The dedup_simhash recall discipline over decoded
    * image rasters. Scale shape: the decode+hash map is per-row; the
    * join shuffles (band, 16-bit key) pairs; per-bucket fanout is
    * quadratic ONLY below the cap, so no hot key can concentrate
    * super-constant work on one task — the uncapped form measured 16×
    * at 10× data on the degenerate fixture (SCALE.md), exactly the
    * regime this guard exists for. */
  def phashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ph = imagePhash(s, d).select($"doc_id", $"phash")
    val banded = ph
      .select($"doc_id", $"phash", explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("key",
        expr("shiftright(phash, CAST(band * 16 AS INT)) & 65535"))
      // bucket population via one partitioned window over the banded
      // frame (the containment df pattern — no second aggregate+join)
      .withColumn("pop", count(lit(1)).over(Window.partitionBy($"band", $"key")))
      .where($"pop" <= PhashBucketCap)
      .drop("pop")
      // both sides of the band self-join read the capped frame once
      .localCheckpoint(eager = false)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.phash").as("ph_a"), col("b.phash").as("ph_b"))
      .distinct() // a pair can collide in several bands — count it once
      .select($"doc_a", $"doc_b",
        expr("CAST(bit_count(ph_a ^ ph_b) AS BIGINT)").as("hamming"))
      .where($"hamming" <= 3)
  }

  /** Sample rate of the synthesized PCM audio container. */
  val AudioRateHz = 8000

  /** Encode payload bytes as an 8-bit unsigned mono PCM WAV via the
    * JDK's javax.sound.sampled WAV writer (the second real codec the
    * JDK ships beside ImageIO's PNG). PCM-in-WAV is lossless: the data
    * chunk IS the sample bytes, so decoded samples equal the payload —
    * the same identity that lets the oracle replay feature math
    * analytically while a real container encoder runs in the hot path. */
  def encodeWav(bytes: Array[Byte]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioRateHz.toFloat, 8, 1, false, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, bytes.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV via the JDK's parser: returns (header sample rate,
    * samples). The rate comes from the REAL parsed container header —
    * the metadata path — never assumed from the writer's constant. */
  def decodeWav(wav: Array[Byte]): (Long, Array[Byte]) = {
    import javax.sound.sampled._
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(wav))
    try {
      val rate = ais.getFormat.getSampleRate.toLong
      (rate, ais.readAllBytes())
    } finally ais.close()
  }

  final case class AudioRow(doc_id: Long, n_samples: Long, sample_rate: Long,
    sum_sq: Long, max_amp: Long)

  /** REAL audio kernel over the synthesized WAV container — one codec
    * round-trip per [[DecodeBatchSize]] batch (payloads concatenated
    * into one WAV, decoded once, sliced by offset — the
    * [[decodeFeatures]] batching), then integer signal features off the
    * decoded samples: energy Σ(128−s)² and peak amplitude max|128−s|
    * around the unsigned-PCM midline, both pure BIGINT so the oracle
    * replays them exactly; the sample rate is parsed from the real WAV
    * header (one parse per batch — the rate is a container property). */
  def audioFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          val total = batch.iterator.map(_.media.length).sum
          val all = new Array[Byte](total)
          var off = 0
          batch.foreach { r => System.arraycopy(r.media, 0, all, off, r.media.length); off += r.media.length }
          val (rate, samples) = decodeWav(encodeWav(all))
          off = 0
          batch.map { r =>
            val n = r.media.length
            var sumSq = 0L; var maxAmp = 0L
            var i = off
            while (i < off + n) {
              val a = 128L - (samples(i) & 0xff)
              sumSq += a * a
              if (math.abs(a) > maxAmp) maxAmp = math.abs(a)
              i += 1
            }
            off += n
            AudioRow(r.doc_id, n.toLong, rate, sumSq, maxAmp)
          }
        }
      }
      .toDF()
  }

  /** Identity 256-gray palette: pixel byte == palette index == gray
    * value. TYPE_BYTE_INDEXED with this palette keeps the GIF round-trip
    * byte-exact — TYPE_BYTE_GRAY would route through a linear-gray →
    * sRGB color conversion (gamma) inside the writer and corrupt the
    * values. */
  private lazy val GrayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Frame raster geometry: [[FrameBytes]] = 32 bytes per frame as 8×4. */
  private val GifFrameW = 8
  private val GifFrameH = FrameBytes / GifFrameW

  /** Encode payload bytes as a REAL multi-frame (animated) GIF via the
    * JDK's ImageIO sequence writer — one 8×4 indexed-gray frame per
    * [[FrameBytes]] chunk, zero-padded tail. The one genuinely
    * frame-indexed container codec the JDK ships. */
  def encodeGif(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "JDK GIF writer unavailable")
    val writer = writers.next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      bytes.grouped(FrameBytes).foreach { chunk =>
        val img = new java.awt.image.BufferedImage(GifFrameW, GifFrameH,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, GrayPalette)
        img.getRaster.setDataElements(0, 0, GifFrameW, GifFrameH,
          java.util.Arrays.copyOf(chunk, FrameBytes))
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Read every `stride`-th frame of a GIF container via the JDK reader
    * and return (gifFrameIndex, lead pixel byte). The reader is asked for
    * the FRAME COUNT from the container (getNumImages) and decodes ONLY
    * the sampled frames — the seek-and-decode-keyframes shape of a video
    * sampling stage; skipped frames' pixel data is never decoded. */
  def sampleGif(gif: Array[Byte], stride: Int): Seq[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    require(readers.hasNext, "JDK GIF reader unavailable")
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n by stride).map { i =>
        val img = reader.read(i)
        (i, img.getRaster.getSample(0, 0, 0))
      }
    } finally { reader.dispose(); iis.close() }
  }

  final case class FrameRow(doc_id: Long, frame_no: Long, lead_byte: Long)

  /** REAL frame sampling over a REAL container (round-7 graduation of
    * the last synthetic-stride kernel): each payload is encoded as a
    * multi-frame animated GIF ([[FrameBytes]]-byte frames) and every 4th
    * frame is decoded back through the JDK GIF reader, emitting the
    * frame's lead pixel — one encode + ceil(frames/4) frame decodes per
    * doc, per-asset containers being the natural video shape (one codec
    * container per media row, unlike the PNG kernels' concatenated
    * batches). Identity-palette indexed GIF is lossless, so the lead
    * pixel equals the payload byte at frame_no·128 and the analytic
    * oracle is unchanged. Shuffle-free; frame decode cost is bounded by
    * the payload, not the corpus. */
  def sampleFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .where(length($"text") >= 1)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.flatMap { r =>
          val gif = encodeGif(r.media)
          sampleGif(gif, 4).map { case (fi, px) =>
            FrameRow(r.doc_id, (fi / 4).toLong, px.toLong)
          }
        }
      }
      .toDF()
  }

  final case class SceneRow(doc_id: Long, n_frames: Long, n_cuts: Long,
      first_cut: Long)

  /** Scene-cut detection over the REAL GIF container: every frame is
    * decoded through the JDK reader (the full-decode pass a real
    * shot-boundary detector pays, unlike [[sampleFrames]]' stride
    * seek), and a cut is flagged where the lead-pixel jump vs the
    * previous frame exceeds 64 gray levels — the standard
    * frame-difference detector reduced to the one pixel the analytic
    * oracle can replay (identity-palette GIF is lossless, so lead
    * pixel == payload byte at frame_no·[[FrameBytes]]). Emits per doc:
    * frame count from the container index, cut count, first cut frame
    * (−1 when none). Per-row codec work bounded by the payload;
    * shuffle-free. */
  def sceneCuts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .where(length($"text") >= 1)
      .select($"doc_id", $"text".cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { it =>
        it.map { r =>
          val gif = encodeGif(r.media)
          val px = sampleGif(gif, 1).map(_._2)
          val cuts = (1 until px.size)
            .filter(i => math.abs(px(i) - px(i - 1)) > 64)
          SceneRow(r.doc_id, px.size.toLong, cuts.size.toLong,
            cuts.headOption.map(_.toLong).getOrElse(-1L))
        }
      }
      .toDF()
  }

  /** Oracle fixture invariants (documents.parquet, driver-generated):
    * the payload replays below assume ASCII text — byte == char code, so
    * DuckDB's `ascii(substr(...))` equals the engine's byte read — pinned
    * in MultimodalSpec (max code point < 128 at test SF), so a
    * regenerated non-ASCII fixture fails the PIN with a clear message
    * instead of flagging the codec kernels. The per-position replays
    * derive their position range from EACH DOC'S OWN length
    * (`unnest(range(1, length(text)+1))` — round 8; the old
    * `generate_series(1, 8192)` literal silently truncated docs longer
    * than the fixture's current max), and empty docs survive via LEFT
    * JOIN + coalesce(0) exactly as the engine's kernels emit zero
    * features for a zero-length payload (law in MultimodalSpec). */
  /** Shared phash derivation CTEs (px -> b -> t -> h): consumed by BOTH
    * the mm_image_phash oracle and the dedup_phash all-pairs oracle so
    * the two cannot desynchronize on the pooling arithmetic. */
  private def phashCtes: String = s"""px AS (
        SELECT doc_id, length(text) AS n,
               unnest(range(1, length(text) + 1)) AS i, text
        FROM documents),
      b AS (
        SELECT doc_id, n,
               (((i - 1) // $ImageW) * 8 // ((n + ${ImageW - 1}) // $ImageW)) * 8
                 + ((i - 1) % $ImageW) // 8 AS blk,
               CAST(sum(ascii(substr(text, CAST(i AS INT), 1))) AS BIGINT) AS s,
               count(*) AS c
        FROM px GROUP BY doc_id, n, blk),
      t AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS total FROM b GROUP BY doc_id),
      h AS (
        SELECT b.doc_id,
               CAST(sum(CASE WHEN b.s * b.n > t.total * b.c
                             THEN CASE WHEN blk = 63
                                       THEN CAST(-9223372036854775807 AS BIGINT) - 1
                                       ELSE (CAST(1 AS BIGINT) << CAST(blk AS INT)) END
                             ELSE 0 END) AS BIGINT) AS phash
        FROM b JOIN t USING (doc_id) GROUP BY b.doc_id)"""

  val oracle: Map[String, String] = Map(
    // lossless PCM-in-WAV ⇒ decoded samples equal payload bytes; the
    // engine's sample_rate comes from the parsed header, the oracle's
    // from the layout constant — agreement proves the parse
    // lossless PNG ⇒ raster == payload bytes; the 8×8 average-pool
    // threshold replays as exact integer cross-multiplication, bit 63
    // via the explicit Long.MinValue constant (DuckDB raises on 1<<63)
    "mm_image_phash" -> s"""
      WITH $phashCtes
      SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_pixels,
             coalesce(h.phash, 0) AS phash
      FROM documents d LEFT JOIN h USING (doc_id)""",

    // EXHAUSTIVE all-pairs reference for the banded engine join: tau =
    // bands-1 = 3 makes banding lossless (pigeonhole) up to the bucket
    // cap, and the cap is part of the declared contract — a pair
    // qualifies iff hamming <= 3 AND at least one band it agrees on
    // sits in a bucket of population <= PhashBucketCap (hot buckets =
    // degenerate rasters, the SSJoin skew guard). Enumeration here is
    // exhaustive pairs + an agreeing-cold-band EXISTS — independent of
    // the engine's join+distinct mechanics
    "dedup_phash" -> s"""
      WITH $phashCtes,
      p AS (SELECT d.doc_id, coalesce(h.phash, 0) AS phash
            FROM documents d LEFT JOIN h USING (doc_id)),
      bd AS (SELECT doc_id, phash, band,
                    (phash >> CAST(band * 16 AS INT)) & 65535 AS key
             FROM (SELECT doc_id, phash, unnest(range(0, 4)) AS band FROM p)),
      pop AS (SELECT band, key, count(*) AS n FROM bd GROUP BY 1, 2)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      FROM p a JOIN p b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 3
        AND EXISTS (SELECT 1
                    FROM bd x JOIN bd y
                      ON x.band = y.band AND x.key = y.key
                    JOIN pop ON pop.band = x.band AND pop.key = x.key
                    WHERE x.doc_id = a.doc_id AND y.doc_id = b.doc_id
                      AND pop.n <= $PhashBucketCap)""",

    "mm_audio" -> s"""
      WITH px AS (
        SELECT doc_id, unnest(range(1, length(text) + 1)) AS i, text
        FROM documents),
      a AS (
        SELECT doc_id,
               CAST(sum((128 - ascii(substr(text, CAST(i AS INT), 1)))
                      * (128 - ascii(substr(text, CAST(i AS INT), 1)))) AS BIGINT) AS sum_sq,
               CAST(max(abs(128 - ascii(substr(text, CAST(i AS INT), 1)))) AS BIGINT) AS max_amp
        FROM px GROUP BY doc_id)
      SELECT d.doc_id, length(d.text) AS n_samples,
             CAST($AudioRateHz AS BIGINT) AS sample_rate,
             coalesce(a.sum_sq, 0) AS sum_sq,
             coalesce(a.max_amp, 0) AS max_amp
      FROM documents d LEFT JOIN a USING (doc_id)""",

    "mm_resize" -> ("""
      WITH px AS (
        SELECT doc_id, length(text) AS n,
               unnest(range(1, length(text) + 1)) AS i, text
        FROM documents),
      a AS (
        SELECT doc_id, """ +
      (0 until 4).map(b =>
        s"round(avg(CASE WHEN ((i - 1) * 4) // n = $b THEN ascii(substr(text, CAST(i AS INT), 1)) END), 4) AS b$b")
        .mkString(", ") + """
        FROM px GROUP BY doc_id)
      SELECT d.doc_id, length(d.text) AS n_bytes, """ +
      (0 until 4).map(b => s"coalesce(a.b$b, 0.0) AS b$b").mkString(", ") + """
      FROM documents d LEFT JOIN a USING (doc_id)"""),

    "mm_frames" -> """
      SELECT doc_id, (i - 1) // 128 AS frame_no,
             ascii(substr(text, CAST(i AS INT), 1)) AS lead_byte
      FROM (SELECT doc_id, unnest(range(1, length(text) + 1)) AS i, text
            FROM documents) px
      WHERE (i - 1) % 128 = 0""",

    // lossless container ⇒ every frame's lead pixel is the payload byte
    // at frame_no·32; the oracle replays the frame-difference detector
    // on those bytes
    "mm_scene_cuts" -> """
      WITH f AS (
        SELECT doc_id, (i - 1) // 32 AS frame_no,
               ascii(substr(text, CAST(i AS INT), 1)) AS px
        FROM (SELECT doc_id, unnest(range(1, length(text) + 1)) AS i, text
              FROM documents) s
        WHERE (i - 1) % 32 = 0),
      d AS (
        SELECT doc_id, frame_no,
               px - lag(px) OVER (PARTITION BY doc_id ORDER BY frame_no)
                 AS diff
        FROM f)
      SELECT doc_id, count(*) AS n_frames,
             count(*) FILTER (WHERE abs(diff) > 64) AS n_cuts,
             CAST(coalesce(min(frame_no) FILTER (WHERE abs(diff) > 64), -1)
                  AS BIGINT) AS first_cut
      FROM d GROUP BY doc_id""",

    // the oracle derives width/height/frames ANALYTICALLY from the layout
    // (fixed width, zero-padded rows); the engine parses them from the
    // real encoded container's IHDR — agreement proves the header parse
    "mm_meta" -> """
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             sha256(text) AS digest,
             CAST(64 AS BIGINT) AS width,
             CAST(greatest(1, (octet_length(encode(text)) + 63) // 64) AS BIGINT) AS height,
             CAST((octet_length(encode(text)) + 31) // 32 AS BIGINT) AS n_frames
      FROM documents""",
    // decode oracle: lossless grayscale PNG ⇒ decoded pixels equal payload
    // bytes, so features are evenly-sampled byte codes (ASCII corpus:
    // byte == char code)
    "mm_decode" -> ("""
      SELECT doc_id, length(text) AS n_bytes, """ +
      (0 until 8).map(j =>
        s"CAST(ascii(substr(text, least(($j * length(text)) // 8, length(text) - 1) + 1, 1)) AS DOUBLE) AS f$j")
        .mkString(", ") + """
      FROM documents""")
  )
}
