package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as partition-local batch functions over those bytes.
  *
  * ⚠ STUB BOUNDARY: no image/audio codecs exist in this container, so
  * `decodeHeader` below is a clearly-marked deterministic FAKE decoder (it
  * parses our own synthetic 16-byte header). Everything around it — the
  * schema contract, binary column handling, partition-local batching,
  * bounded per-batch memory — is the real Spark plumbing; swapping in a
  * JNI/JavaCV decoder (or, in PySpark, a Pandas UDF via `mapInPandas` with
  * Arrow batches) is a body-only change behind `MediaDecoder`.
  */
object Multimodal {

  final case class MediaMeta(media_id: Long, kind: String, width: Int,
                             height: Int, duration_ms: Int, n_bytes: Int)

  /** Synthetic media corpus derived deterministically from any id column:
    * 20-byte header [magic "GRFT"(4) | width-hex(8) | height-hex(8)] +
    * payload bytes (the kind travels as its own column, not in the header).
    * Header fields derive from the engine-portable md5-based
    * `TextAnalysis.hash60`, so the decode stage's output is independently
    * re-derivable by the DuckDB oracle (a true round-trip check of the
    * binary plumbing).
    */
  def synthMedia(docs: DataFrame): DataFrame = {
    val kinds = array(lit("image"), lit("audio"), lit("video"))
    def h(tag: String) =
      TextAnalysis.hash60(concat_ws(":", col("doc_id").cast("string"), lit(tag)))
    docs.select(
      col("doc_id").as("media_id"),
      element_at(kinds, (pmod(h("k"), lit(3)) + 1).cast("int")).as("kind"),
      // header+payload as binary: header fields hex-encoded;
      // payload = utf8 bytes of the text
      concat(
        lit("GRFT").cast("binary"),
        lpad(conv(pmod(h("w"), lit(4096)).cast("string"), 10, 16), 8, "0").cast("binary"),
        lpad(conv(pmod(h("h"), lit(4096)).cast("string"), 10, 16), 8, "0").cast("binary"),
        col("text").cast("binary")).as("payload"))
  }

  /** Decoder seam. Batch-in/batch-out so a real implementation can amortize
    * codec setup per partition (exactly the broadcast-ONNX pattern of the
    * mention tagger).
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(rows: Seq[(Long, String, Array[Byte])]): Seq[MediaMeta]
  }

  /** STUB: parses the synthetic header; deterministic, codec-free.
    * Replace with a real codec (??? in production terms) — contract only.
    */
  object FakeDecoder extends MediaDecoder {
    def decodeBatch(rows: Seq[(Long, String, Array[Byte])]): Seq[MediaMeta] =
      rows.map { case (id, kind, bytes) =>
        val hex = new String(bytes.slice(4, 20), "UTF-8")
        val w = Integer.parseInt(hex.substring(0, 8), 16)
        val h = Integer.parseInt(hex.substring(8, 16), 16)
        MediaMeta(id, kind, w, h, duration_ms = (bytes.length - 20) * 10,
          n_bytes = bytes.length)
      }
  }

  /** Decode stage: binary column → typed metadata, partition-local batches
    * of 128 (bounds per-batch heap regardless of payload size distribution).
    */
  def decode(media: DataFrame, decoder: MediaDecoder = FakeDecoder): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.grouped(128).flatMap(decoder.decodeBatch))
  }

  /** Frame-sample: every `stride`-th payload byte starting at the first
    * post-header byte (stand-in for video frame sampling). Spark has no
    * binary→array cast, so the slice runs as a Scala UDF over the byte
    * array — the same shape a real frame sampler (which must touch the
    * bytes anyway) would take.
    */
  def frameSample(media: DataFrame, stride: Int = 64): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    val sample = udf((payload: Array[Byte]) =>
      if (payload == null) null
      else (20 until payload.length by stride).map(payload(_)).toArray)
    media.select(col("media_id"), sample(col("payload")).as("sampled_bytes"))
  }

  /** Byte-histogram feature extraction (16 coarse bins over the full
    * payload) — the "embedding" of the fake modality; real systems put
    * CLIP/VGGish here. One pass over the bytes in a UDF (see frameSample
    * for why not column expressions).
    */
  def byteHistogram(media: DataFrame): DataFrame = {
    val hist = udf((payload: Array[Byte]) =>
      if (payload == null) null
      else {
        val out = new Array[Int](16)
        payload.foreach(b => out(((b.toInt + 256) >> 4) & 15) += 1)
        out
      })
    media.select(col("media_id"), hist(col("payload")).as("byte_hist"))
  }
}
