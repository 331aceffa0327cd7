package graft.operators

import graft.SparkSpec

/** Laws for the real (javax.imageio) multimodal kernels: the grayscale
  * PNG round-trip must be lossless (that identity is what lets the
  * DuckDB oracle replay pixel math analytically while a real codec runs
  * in the hot path), the IHDR parse must return the encoded container's
  * dimensions, and the batched decode must equal the per-row decode. */
class MultimodalSpec extends SparkSpec {

  test("grayscale PNG round-trip is lossless, tail zero-padded") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 63, 64, 65, 1000)) {
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val px = Multimodal.decodePng(Multimodal.encodePng(bytes))
      val h = math.max(1, (n + Multimodal.ImageW - 1) / Multimodal.ImageW)
      assert(px.length == Multimodal.ImageW * h, s"n=$n raster size")
      assert(px.take(n).sameElements(bytes), s"n=$n pixels != payload")
      assert(px.drop(n).forall(_ == 0), s"n=$n padding not zero")
    }
  }

  test("animated GIF container: frame count, stride sampling, and lead pixels equal a direct byte replay") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 31, 32, 33, 128, 129, 1000)) {
      // arbitrary BYTES, not just ASCII — the identity-palette round-trip
      // must be lossless over the full 0..255 range
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val gif = Multimodal.encodeGif(bytes)
      // it is a real GIF container (magic) with one frame per 32B chunk
      assert(gif.take(6).map(_.toChar).mkString.startsWith("GIF8"), s"n=$n not a GIF")
      val all = Multimodal.sampleGif(gif, 1)
      val expectFrames = (n + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes
      assert(all.size == expectFrames, s"n=$n frame count")
      // every frame's lead pixel is the chunk's first payload byte
      all.foreach { case (fi, px) =>
        assert(px == (bytes(fi * Multimodal.FrameBytes) & 0xff), s"n=$n frame $fi lead")
      }
      // stride-4 sampling keeps exactly frames 0, 4, 8, ...
      val sampled = Multimodal.sampleGif(gif, 4)
      assert(sampled.map(_._1) == (0 until expectFrames by 4), s"n=$n stride")
    }
  }

  test("scene cuts: planted lead-pixel jumps are detected at the right frames") {
    // 4 frames with lead bytes 10, 10, 120, 115: diffs 0, 110, −5 →
    // exactly one cut, at frame 2 (threshold |diff| > 64)
    val bytes = new Array[Byte](4 * Multimodal.FrameBytes)
    bytes(0) = 10; bytes(Multimodal.FrameBytes) = 10
    bytes(2 * Multimodal.FrameBytes) = 120.toByte
    bytes(3 * Multimodal.FrameBytes) = 115.toByte
    val gif = Multimodal.encodeGif(bytes)
    val px = Multimodal.sampleGif(gif, 1).map(_._2)
    assert(px == Seq(10, 10, 120, 115))
    val cuts = (1 until px.size).filter(i => math.abs(px(i) - px(i - 1)) > 64)
    assert(cuts == Seq(2))
  }

  test("IHDR parse returns the encoded container's dimensions") {
    for (n <- Seq(1, 64, 65, 4096)) {
      val png = Multimodal.encodePng(Array.fill(n)(7.toByte))
      val (w, h) = Multimodal.parseIhdr(png)
      assert(w == Multimodal.ImageW)
      assert(h == math.max(1, (n + Multimodal.ImageW - 1) / Multimodal.ImageW))
    }
  }

  test("WAV round-trip is lossless and the header carries the encoded rate") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 100, 4096)) {
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val (rate, samples) = Multimodal.decodeWav(Multimodal.encodeWav(bytes))
      assert(rate == Multimodal.AudioRateHz)
      assert(samples.sameElements(bytes), s"n=$n samples != payload")
    }
  }

  test("batched audio features equal a direct byte replay") {
    import spark.implicits._
    val got = Multimodal.audioFeatures(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    assert(docs.nonEmpty && got.size == docs.length)
    for ((id, b) <- docs) {
      val amps = b.map(x => 128L - (x & 0xff))
      val want = (b.length.toLong, Multimodal.AudioRateHz.toLong,
        amps.map(a => a * a).sum, if (amps.isEmpty) 0L else amps.map(math.abs).max)
      assert(got(id) == want, s"doc $id audio features")
    }
  }

  test("batched decode features equal direct byte sampling") {
    import spark.implicits._
    val got = Multimodal.decodeFeatures(spark, sf).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(j => r.getDouble(j + 1)).toSeq).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    assert(docs.nonEmpty && got.size == docs.length)
    for ((id, bytes) <- docs) {
      val n = bytes.length
      val want = (0 until 8).map(j =>
        if (n == 0) 0.0 else (bytes(math.min(j * n / 8, n - 1)) & 0xff).toDouble)
      assert(got(id) == want, s"doc $id decode features")
    }
  }

  test("shipped fixture is ASCII — the byte==char assumption behind every mm oracle replay") {
    // the DuckDB oracles read positions with ascii(substr(...)) (code
    // points) while the engine reads UTF-8 BYTES; they agree iff the
    // corpus is ASCII. Pinning it here means a regenerated non-ASCII
    // fixture fails with this message instead of flagging the codecs.
    import spark.implicits._
    val nonAscii = graft.core.Tables.documents(spark, sf)
      .select($"text").as[String].flatMap(_.toCharArray.map(_.toInt))
      .filter(_ >= 128).count()
    assert(nonAscii == 0,
      "documents fixture contains non-ASCII chars; the mm oracles' " +
        "ascii(substr(...)) replay no longer equals the engine's byte reads")
  }

  test("mm oracles are regeneration-proof: empty, boundary, and beyond-8192 docs agree with a byte replay") {
    // round-8 law for the derived replay bound: the oracles' position
    // range now comes from each doc's own length (unnest(range(...)))
    // and empty docs survive via LEFT JOIN + coalesce(0). This replays
    // the same math engine-side on a staged fixture the shipped corpus
    // never exercises — a zero-length doc, a doc at the OLD 8192 series
    // literal, and one beyond it — so a fixture regeneration with longer
    // or empty docs can never silently diverge engine from oracle.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mm_law").toString
    val rnd = new scala.util.Random(11)
    val longDoc = Array.fill(10000)((32 + rnd.nextInt(95)).toChar).mkString
    val docs = Seq((1L, ""), (2L, "a"), (3L, "q" * 8192), (4L, longDoc))
    docs.toDF("doc_id", "text").repartition(2)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // audio: energy/peak equal the per-byte replay; empty doc emits zeros
    val audio = Multimodal.audioFeatures(spark, tmp).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    assert(audio.keySet == docs.map(_._1).toSet, "every doc incl. the empty one emits a row")
    for ((id, text) <- docs) {
      val bytes = text.getBytes("US-ASCII")
      val sumSq = bytes.map { b => val v = 128L - (b & 0xff); v * v }.sum
      val maxAmp = if (bytes.isEmpty) 0L else bytes.map(b => math.abs(128 - (b & 0xff)).toLong).max
      val r = audio(id)
      assert(r.getLong(r.fieldIndex("n_samples")) == bytes.length, s"doc $id n_samples")
      assert(r.getLong(r.fieldIndex("sum_sq")) == sumSq, s"doc $id sum_sq")
      assert(r.getLong(r.fieldIndex("max_amp")) == maxAmp, s"doc $id max_amp")
    }

    // resize: 4-block average pool equals the replay; empty doc = zero blocks
    val resize = Multimodal.resizeBlocks(spark, tmp).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
    for ((id, text) <- docs) {
      val bytes = text.getBytes("US-ASCII")
      val want = (0 until 4).map { b =>
        val in = bytes.zipWithIndex.collect {
          case (v, i) if (i.toLong * 4 / math.max(1, bytes.length)).toInt == b && bytes.nonEmpty => (v & 0xff).toDouble
        }
        if (in.isEmpty) 0.0
        else BigDecimal(in.sum / in.length).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val r = resize(id)
      val got = (0 until 4).map(b => r.getDouble(r.fieldIndex(s"b$b")))
      assert(got == want, s"doc $id resize blocks: got $got want $want")
    }

    // frames: stride sampling covers the whole long doc (no 8192 truncation)
    val frames = Multimodal.sampleFrames(spark, tmp).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(frames.getOrElse(1L, 0) == 0, "empty doc has no frames")
    assert(frames(3L) == (8192 + 127) / 128, "8192-char doc frame count")
    assert(frames(4L) == (10000 + 127) / 128, "10000-char doc samples past the old 8192 bound")

    // scene cuts: frame counts span the full long doc
    val cuts = Multimodal.sceneCuts(spark, tmp).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getLong(r.fieldIndex("n_frames"))).toMap
    assert(!cuts.contains(1L), "empty doc filtered from scene cuts")
    assert(cuts(4L) == (10000 + 31) / 32, "scene-cut frames span past the old bound")
  }

  test("dedup_phash banding is lossless up to the cap: the banded join equals the brute-force capped replay") {
    // τ = 3 = bands − 1, so by pigeonhole any pair within hamming 3 must
    // agree on at least one 16-bit band; the declared contract keeps the
    // pair iff at least one AGREEING band sits in a bucket of population
    // ≤ PhashBucketCap. Replay that set driver-side from the emitted
    // phashes and demand set equality — the same discipline the DuckDB
    // oracle applies cross-engine.
    val hashes = Multimodal.imagePhash(spark, sf).collect()
      .map(r => r.getLong(r.fieldIndex("doc_id")) -> r.getLong(r.fieldIndex("phash")))
    def bandKey(p: Long, b: Int): Long = (p >>> (b * 16)) & 0xffffL
    val pop = hashes.flatMap { case (_, p) => (0 until 4).map(b => (b, bandKey(p, b))) }
      .groupBy(identity).view.mapValues(_.length).toMap
    val brute = (for {
      (ida, pa) <- hashes; (idb, pb) <- hashes
      if ida < idb && java.lang.Long.bitCount(pa ^ pb) <= 3
      if (0 until 4).exists(b => bandKey(pa, b) == bandKey(pb, b) &&
        pop((b, bandKey(pa, b))) <= Multimodal.PhashBucketCap)
    } yield (ida, idb, java.lang.Long.bitCount(pa ^ pb).toLong)).toSet
    val banded = graft.SparkEntry.queries("dedup_phash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size}; diff=${(banded diff brute) ++ (brute diff banded)}")
    banded.foreach { case (a, b, h) =>
      assert(a < b && h >= 0 && h <= 3, s"canonical orientation / τ bound violated: ($a,$b,$h)")
    }
  }
}
