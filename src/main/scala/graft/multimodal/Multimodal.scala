package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` content plus a
  * typed metadata struct, with decode / feature-extraction / frame
  * sampling as per-partition batch operators.
  *
  * Codec status (round 5): IMAGE decode is REAL — [[ImageDecoder]] rides
  * the JDK's own `javax.imageio` (PNG/BMP/GIF/JPEG, headless, zero
  * external libs) and grid-pools luminance into a fixed-dim feature.
  * WAV AUDIO decode is REAL — [[WavDecoder]] parses PCM via
  * `javax.sound.sampled` and emits per-window RMS energy. VIDEO remains
  * a documented deterministic stub ([[StubDecoder]]) because no video
  * codec exists in the JDK and this container has no native libraries;
  * [[JdkMediaDecoder]] routes per kind. MultimodalSpec round-trips
  * synthetic PNG and WAV bytes through the full Dataset pipeline.
  *
  * Scale posture: decode runs via `mapPartitions` so a real codec
  * amortizes decoder init per partition (the JVM analog of
  * batch-at-a-time Pandas UDFs); media rows never shuffle un-decoded
  * unless the caller asks for it.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaItem(
      media_id: Long,
      kind: String,          // image | audio | video
      content: Array[Byte],  // opaque encoded bytes
      width: Int,
      height: Int,
      duration_ms: Long)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      feature: Array[Float], // fixed-dim embedding from the decoder
      n_frames: Int)

  /** Decoder contract: bytes → fixed-dim features + frame count. */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def decode(item: MediaItem): MediaFeatures
  }

  /** Deterministic fake decoder (no codec libs in this container): features
    * are md5-seeded pseudo-values in [-1, 1]; frame count derives from
    * duration at 1 fps. Replace with a real codec via [[MediaDecoder]].
    */
  class StubDecoder(val dim: Int = 16) extends MediaDecoder {
    override def decode(item: MediaItem): MediaFeatures = {
      val md = MessageDigest.getInstance("MD5")
      val seed = md.digest(item.content)
      val feats = Array.tabulate(dim) { i =>
        // two hash bytes per feature → deterministic value in [-1, 1]
        val hi = seed(i % seed.length) & 0xff
        val lo = seed((i + 7) % seed.length) & 0xff
        (((hi << 8) | lo) / 32767.5f) - 1.0f
      }
      val frames = if (item.kind == "video") math.max(1, (item.duration_ms / 1000).toInt) else 1
      MediaFeatures(item.media_id, item.kind, feats, frames)
    }
  }

  /** REAL image decoder on the JDK's built-in `javax.imageio` (PNG, BMP,
    * GIF, JPEG — headless, no native libraries): the image is grid-pooled
    * into `grid`×`grid` cells and each feature is the cell's mean ITU-R
    * BT.601 luminance mapped onto [-1, 1]. Pooling IS the resize step —
    * any input resolution lands on the same fixed-dim feature. Integer
    * luminance accumulation keeps the result bit-deterministic across
    * JVMs; one final divide per cell.
    */
  class ImageDecoder(grid: Int = 4) extends MediaDecoder {
    override val dim: Int = grid * grid
    override def decode(item: MediaItem): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(item.content))
      require(img != null, s"undecodable image bytes for media_id=${item.media_id}")
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](dim)
      val counts = new Array[Long](dim)
      var y = 0
      while (y < h) {
        val gy = math.min(grid - 1, y * grid / h)
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // luminance ×1000 stays integral: 299·R + 587·G + 114·B
          val lum = ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
            (rgb & 0xff) * 114L
          val c = gy * grid + math.min(grid - 1, x * grid / w)
          sums(c) += lum
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      val feats = Array.tabulate(dim) { i =>
        if (counts(i) == 0L) 0.0f
        else ((sums(i).toDouble / counts(i) / 1000.0) / 127.5 - 1.0).toFloat
      }
      MediaFeatures(item.media_id, item.kind, feats, 1)
    }
  }

  /** REAL WAV (PCM) decoder on the JDK's `javax.sound.sampled`: the
    * stream is split into `dim` equal windows and each feature is the
    * window's RMS amplitude (16-bit samples normalized by 32768) mapped
    * onto [-1, 1]. Handles mono 16-bit little-endian PCM — the canonical
    * WAV payload; sums of squares are exact longs, one sqrt per window.
    */
  class WavDecoder(override val dim: Int = 16) extends MediaDecoder {
    override def decode(item: MediaItem): MediaFeatures = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(item.content))
      try {
        val fmt = in.getFormat
        // encoding + endianness matter as much as width: a big-endian or
        // unsigned 16-bit stream would pass a width-only check and decode
        // to silently wrong RMS values under the little-endian signed
        // byte pairing below — reject loudly instead
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          !fmt.isBigEndian,
          s"WavDecoder expects mono 16-bit little-endian signed PCM, got $fmt " +
            s"for media_id=${item.media_id}")
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        val feats = Array.tabulate(dim) { wdx =>
          val from = (n.toLong * wdx / dim).toInt
          val until = (n.toLong * (wdx + 1) / dim).toInt
          if (until <= from) 0.0f
          else {
            var ss = 0L
            var i = from
            while (i < until) {
              val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort.toLong
              ss += s * s
              i += 1
            }
            (math.sqrt(ss.toDouble / (until - from)) / 32768.0 * 2.0 - 1.0).toFloat
          }
        }
        MediaFeatures(item.media_id, item.kind, feats, 1)
      } finally in.close()
    }
  }

  /** Kind-routing decoder: the JDK-real codecs where one exists (image →
    * [[ImageDecoder]], audio → [[WavDecoder]]), the documented
    * deterministic stub for video (the JDK ships no video codec and this
    * container has no native media libraries).
    */
  class JdkMediaDecoder(grid: Int = 4) extends MediaDecoder {
    private val image = new ImageDecoder(grid)
    private val wav = new WavDecoder(grid * grid)
    private val stub = new StubDecoder(grid * grid)
    override val dim: Int = grid * grid
    override def decode(item: MediaItem): MediaFeatures = item.kind match {
      case "image" => image.decode(item)
      case "audio" => wav.decode(item)
      case _ => stub.decode(item)
    }
  }

  /** Batch decode: one decoder instance per partition (real codecs pay
    * native init once per partition, not per row).
    */
  def decodeFeatures(items: Dataset[MediaItem], decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map(decoder.decode)
    }
  }

  /** Frame sampling for video rows: emit (media_id, frame_idx) every
    * `everyMs`; non-video rows pass through with frame 0. Declarative —
    * the explode stays in codegen.
    */
  def sampleFrames(items: DataFrame, everyMs: Long): DataFrame =
    items.select(
      col("media_id"), col("kind"),
      explode(
        when(col("kind") === "video",
          sequence(lit(0L), greatest(lit(0L), expr(s"(duration_ms - 1) div $everyMs"))))
        .otherwise(array(lit(0L)))).as("frame_idx"))

  /** Opaque-binary metadata extraction — the decode-free half of media
    * handling, oracle-gated: byte length, content fingerprint, an 8-byte
    * header sniff, and an every-64th-byte sample (the frame-sampling
    * access pattern), all as pure binary builtins over `cast(text as
    * binary)` (the fixtures carry no real media; the byte plumbing is
    * identical). Everything stays inside whole-stage codegen.
    */
  def q_binary_meta(spark: SparkSession, sf: String): DataFrame =
    graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text").cast("binary").as("b"))
      .select(col("doc_id"),
        length(col("b")).cast("long").as("n_bytes"),
        md5(col("b")).as("fp"),
        lower(hex(col("b"))).as("h"))
      .select(
        col("doc_id"), col("n_bytes"), col("fp"),
        substring(col("h"), 1, 16).as("header"),
        expr("concat_ws('', transform(sequence(0, 4), i -> substring(h, i*128 + 1, 2)))")
          .as("sample"))
      .orderBy("doc_id")

  /** Deterministic REAL PNG bytes: a seeded two-band pattern (per-row
    * gradient xor a seed stripe) encoded through the JDK's own PNG
    * writer — what [[ImageDecoder]] round-trips in MultimodalSpec. */
  def pngBytes(seed: Long, w: Int = 32, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((x * 255 / math.max(1, w - 1)) ^ ((seed.toInt * 37 + y) & 0xff)) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic REAL WAV bytes: canonical 44-byte RIFF/PCM header +
    * mono 16-bit little-endian sawtooth whose amplitude derives from the
    * seed — integer samples, so bit-identical on every JVM. */
  def wavBytes(seed: Long, nSamples: Int = 4000, sampleRate: Int = 8000): Array[Byte] = {
    val amp = 2048 + (seed % 8).toInt * 1024
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val period = 100 + (seed % 5).toInt * 20
      val phase = i % period
      out.putShort((amp * (2 * phase - period) / period).toShort)
      i += 1
    }
    out.array()
  }

  /** Synthetic REAL-media fixture: PNG images and WAV audio generated by
    * the JDK encoders (plus stub-backed video rows), so the decode
    * pipeline is exercised end-to-end on genuine bytes. */
  def syntheticRealMedia(spark: SparkSession, n: Int): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      (i % 3) match {
        case 0 => MediaItem(i, "image", pngBytes(i), 32, 32, 0L)
        case 1 => MediaItem(i, "audio", wavBytes(i), 0, 0, 500L)
        case _ => MediaItem(i, "video",
          s"media-content-$i".getBytes(StandardCharsets.UTF_8), 64, 64,
          1000L * (1 + i % 10))
      }
    }
  }

  /** Synthetic deterministic media fixture (content = seeded bytes). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = (i % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val content = s"media-content-$i".getBytes(StandardCharsets.UTF_8)
      MediaItem(i, kind, content, 64 + (i % 4).toInt * 16, 64, 1000L * (1 + i % 10))
    }
  }
}
