package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** Round-5 upgrade gates: the image and WAV decoders are REAL (JDK
  * javax.imageio / javax.sound.sampled), verified against hand-computed
  * features on crafted bytes, plus the end-to-end partition-batched
  * Dataset pipeline on genuine PNG/WAV payloads. Video stays the
  * documented stub (no JDK video codec) and must route to it unchanged.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("image decoder: exact grid luminance on a crafted half-black/half-white PNG") {
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val item = MediaItem(7L, "image", baos.toByteArray, 32, 32, 0L)
    val f = new ImageDecoder(4).decode(item)
    assert(f.feature.length === 16)
    // grid columns 0-1 cover x<16 (black, luminance 0 -> -1); columns 2-3
    // cover x>=16 (white, luminance 255 -> +1)
    for (cell <- 0 until 16) {
      val expected = if (cell % 4 < 2) -1.0f else 1.0f
      assert(math.abs(f.feature(cell) - expected) < 1e-6,
        s"cell $cell: ${f.feature(cell)} != $expected")
    }
  }

  test("image decoder: any resolution pools onto the same fixed dim") {
    for (w <- Seq(5, 32, 97); h <- Seq(3, 64)) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      val f = new ImageDecoder(4).decode(MediaItem(1L, "image", baos.toByteArray, w, h, 0L))
      assert(f.feature.length === 16)
      // covered cells are black (-1); an image SMALLER than the grid
      // leaves some cells pixel-free, which decode to the 0 sentinel
      assert(f.feature.forall(v => v == 0.0f || math.abs(v + 1.0f) < 1e-6),
        s"${w}x$h all-black image: ${f.feature.toSeq}")
      assert(f.feature.count(v => math.abs(v + 1.0f) < 1e-6) >= 8,
        s"${w}x$h: most cells must be covered")
    }
  }

  test("wav decoder: exact RMS of a constant-amplitude square wave") {
    // hand-build mono 16-bit PCM: 2000 samples alternating +/-8192
    val n = 2000
    val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + n * 2).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(n * 2)
    for (i <- 0 until n) buf.putShort(if (i % 2 == 0) 8192 else -8192)
    val f = new WavDecoder(16).decode(MediaItem(3L, "audio", buf.array(), 0, 0, 250L))
    // RMS = 8192/32768 = 0.25 per window -> feature = 0.25*2-1 = -0.5
    assert(f.feature.length === 16)
    f.feature.foreach(v => assert(math.abs(v + 0.5f) < 1e-6, v.toString))
  }

  test("real-media pipeline: PNG + WAV decode end-to-end, partition-batched, deterministic") {
    val items = Multimodal.syntheticRealMedia(spark, 48).repartition(8)
    val run1 = Multimodal.decodeFeatures(items, new JdkMediaDecoder(4))
      .collect().sortBy(_.media_id)
    assert(run1.length === 48)
    assert(run1.forall(_.feature.length === 16))
    // images and audio carry real signal: not every feature is the same
    assert(run1.filter(_.kind == "image").forall(_.feature.distinct.length > 1))
    assert(run1.filter(_.kind == "audio")
      .forall(f => f.feature.forall(v => v >= -1.0f && v <= 1.0f)))
    val run2 = Multimodal.decodeFeatures(items, new JdkMediaDecoder(4))
      .collect().sortBy(_.media_id)
    assert(run1.map(_.feature.toSeq).toSeq === run2.map(_.feature.toSeq).toSeq)
  }

  test("video rows route to the documented stub unchanged") {
    val vid = MediaItem(11L, "video", "media-content-11".getBytes, 64, 64, 5000L)
    val viaRouter = new JdkMediaDecoder(4).decode(vid)
    val viaStub = new StubDecoder(16).decode(vid)
    assert(viaRouter.feature.toSeq === viaStub.feature.toSeq)
    assert(viaRouter.n_frames === 5)
  }
}
