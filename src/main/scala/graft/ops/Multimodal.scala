package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise inside `mapPartitions`.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives deterministic fake dimensions/features
  * from the bytes themselves, so the Spark-side plumbing — schema, typed
  * batch iteration, partitioning, feature schema — is real and tested, and a
  * real decoder drops in by replacing one function.
  */
object Multimodal {

  case class MediaRow(media_id: Long, modality: String, bytes: Array[Byte],
                      source: String)
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Int,
                           fake_width: Int, fake_height: Int,
                           fake_duration_ms: Int, checksum: Long)

  /** Synthesize a deterministic media table from any text table: the bytes
    * are the utf-8 of the text (an opaque stand-in for real image/audio
    * payloads).
    */
  def synthesizeMedia(df: DataFrame, idCol: String, textCol: String,
                      sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("bytes"),
      col(sourceCol).as("source"))

  /** The stubbed decoder: real decode/resize/frame-sample would go here.
    * Deterministic pure function of the payload bytes.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.bytes.length
    var h = 1125899906842597L // fake rolling checksum (deterministic)
    var i = 0
    while (i < n) { h = 31 * h + (r.bytes(i) & 0xff); i += 1 }
    MediaFeatures(r.media_id, r.modality, n,
      fake_width = 64 + (n % 576),
      fake_height = 64 + ((n / 7) % 296),
      fake_duration_ms = if (r.modality == "image") 0 else 1000 + (n % 59000),
      checksum = h)
  }

  /** Batch feature extraction over the binary column — typed mapPartitions
    * (the Scala analog of mapInPandas batch UDFs): one decoder instance per
    * partition, streaming row batches.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition decoder init would happen here (model load, etc.)
      it.map(decodeStub)
    }
  }
}
