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
}
