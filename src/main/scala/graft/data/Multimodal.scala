package graft.data

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal asset: an opaque binary payload plus typed metadata —
  * the schema contract for image/audio/video columns at scale. */
final case class MediaAsset(
    doc_id: Long,
    payload: Array[Byte],
    format: String,
    width: Int,
    height: Int
)

final case class MediaFeatures(
    doc_id: Long,
    n_bytes: Int,
    byte_histogram_peak: Int,
    thumb_width: Int,
    thumb_height: Int
)

/** Multimodal-column plumbing: binary payloads with typed metadata, decoded
  * batch-wise in a typed mapPartitions stage.
  *
  * The actual decoders (image/audio codecs) are NOT available in this
  * environment, so `decodeStub` is a clearly-marked deterministic fake; the
  * Spark-side contract — binary column schema, partition-sized batches,
  * metadata struct, downstream feature columns — is real and tested. At
  * scale the payloads live in their own parquet column chunk (columnar reads
  * skip them unless projected), and decode parallelism is partition
  * parallelism.
  */
object Multimodal {

  /** Synthesize a media table from documents: the UTF-8 text bytes stand in
    * for an encoded image; metadata is derived deterministically. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("fake/raw").as("format"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height")
    )

  /** STUB decoder: stands in for e.g. JPEG decode + resize + feature
    * extraction. Deterministic: byte length, modal byte value, and the
    * "thumbnail" dimensions after a fixed 4x downscale. */
  def decodeStub(a: MediaAsset): MediaFeatures = {
    val hist = new Array[Int](256)
    a.payload.foreach(b => hist(b & 0xff) += 1)
    var peak = 0
    var i = 1
    while (i < 256) { if (hist(i) > hist(peak)) peak = i; i += 1 }
    MediaFeatures(
      doc_id = a.doc_id,
      n_bytes = a.payload.length,
      byte_histogram_peak = peak,
      thumb_width = math.max(1, a.width / 4),
      thumb_height = math.max(1, a.height / 4)
    )
  }

  /** The decode stage: typed partition-wise map, decoder state (codec
    * contexts at real scale) initialized once per partition. */
  def features(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaAsset].mapPartitions { it =>
      // real impl: initialize codec / model context here, once per partition
      it.map(decodeStub)
    }
  }

  /** Frame sampling contract for video-shaped payloads: split a payload into
    * fixed-size COMPLETE frames and keep every `stride`-th — pure column plan.
    * Payloads shorter than one frame yield no rows (sequence(0, -1) would
    * otherwise emit a descending [0, -1] index pair — a real Spark footgun). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = (length(col("payload")) / frameBytes).cast("int")
    media
      .select(
        col("doc_id"),
        explode(
          filter(
            when(
              nFrames > 0,
              transform(
                sequence(lit(0), nFrames - 1),
                i =>
                  struct(
                    i.as("frame_idx"),
                    substring(col("payload"), i * frameBytes + 1, lit(frameBytes)).as("frame")
                  )
              )
            ).otherwise(array().cast("array<struct<frame_idx:int,frame:binary>>")),
            s => s.getField("frame_idx") % stride === 0
          )
        ).as("f")
      )
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"), col("f.frame").as("frame"))
  }
}
