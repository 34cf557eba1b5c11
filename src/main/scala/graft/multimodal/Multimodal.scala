package graft.multimodal

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` content plus a
  * typed metadata struct, with decode / feature-extraction / frame
  * sampling as per-partition batch operators.
  *
  * The actual codec is STUBBED: this container has no image/audio
  * libraries, so [[StubDecoder]] produces a deterministic fake
  * (content-hash-seeded features). Everything around it — the schema, the
  * Dataset plumbing, partition-batched execution, the operator signatures
  * — is real and tested; swapping in a real codec is implementing the
  * [[MediaDecoder]] trait.
  *
  * Scale posture: decode runs via `mapPartitions` so a real codec
  * amortizes native-library init per partition (the JVM analog of
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
