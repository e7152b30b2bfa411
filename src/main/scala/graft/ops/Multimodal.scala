package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise inside `mapPartitions`.
  *
  * Two decode paths:
  *  - `decodeMedia` REALLY parses container headers (PNG IHDR, JPEG SOFn
  *    marker scan, RIFF/WAVE chunk walk) — pure byte reads, no media libs —
  *    over structurally valid synthesized payloads (`synthesizeMediaReal`);
  *  - `decodeStub` remains the honest stand-in for the PIXEL/SAMPLE level
  *    (actual image/audio decoding needs libraries this container lacks):
  *    deterministic fake features over opaque bytes, exercising the same
  *    Spark-side plumbing — schema, typed batch iteration, partitioning.
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

  // ---------------------------------------------------------------- REAL
  // header decode — no media libraries needed: PNG/JPEG/WAV dimensions and
  // duration live in fixed, documented byte positions of the container
  // header (PNG IHDR, JPEG SOFn, RIFF/WAVE fmt+data chunks). The synthesized
  // payloads below are structurally VALID minimal files (correct magics,
  // chunk layout, PNG CRCs), so the decoder is a genuine byte-format parser,
  // not a fixture-shaped fake. A pixel/sample decoder (the part that DOES
  // need image/audio libs) would slot in after the header parse.

  case class RealMediaFeatures(media_id: Long, modality: String, n_bytes: Int,
                               width: Int, height: Int, duration_ms: Int)

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Minimal structurally-valid PNG: signature + IHDR (real CRC32) + IEND.
    * 45 bytes total.
    */
  def pngBytes(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(45)
    out.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte), 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](8 /*bit depth*/, 2 /*truecolor*/, 0, 0, 0))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Minimal JPEG: SOI + SOF0 (baseline frame header, 1 component) + EOI.
    * 17 bytes total.
    */
  def jpegBytes(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(17)
    out.write(0xff); out.write(0xd8)                   // SOI
    out.write(0xff); out.write(0xc0)                   // SOF0
    out.write(0); out.write(11)                        // segment length
    out.write(8)                                       // precision
    out.write((height >> 8) & 0xff); out.write(height & 0xff)
    out.write((width >> 8) & 0xff); out.write(width & 0xff)
    out.write(1)                                       // 1 component
    out.write(1); out.write(0x11); out.write(0)        // comp id/sampling/qtable
    out.write(0xff); out.write(0xd9)                   // EOI
    out.toByteArray
  }

  /** Canonical 44-byte-header PCM WAV: 16-bit mono at `sampleRate`, followed
    * by `nSamples` zero samples (silence) so the declared data-chunk size is
    * really present.
    */
  def wavBytes(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataBytes = nSamples * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataBytes)
    def ascii(s: String): Unit = { val b = s.getBytes("US-ASCII"); out.write(b, 0, b.length) }
    def w32(v: Int): Unit = out.write(le32(v), 0, 4)
    def w16(v: Int): Unit = out.write(le16(v), 0, 2)
    ascii("RIFF"); w32(36 + dataBytes); ascii("WAVE")
    ascii("fmt "); w32(16); w16(1 /*PCM*/); w16(1 /*mono*/)
    w32(sampleRate); w32(sampleRate * 2 /*byteRate*/); w16(2 /*blockAlign*/)
    w16(16 /*bits*/)
    ascii("data"); w32(dataBytes)
    out.write(new Array[Byte](dataBytes), 0, dataBytes)
    out.toByteArray
  }

  private def beInt(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def leInt(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Real header decode, dispatched on the container magic:
    *  - PNG: IHDR is the first chunk by spec — width/height are the 8 bytes
    *    at offset 16 (big-endian)
    *  - JPEG: scan the marker stream for SOFn (0xC0-0xCF minus C4/C8/CC);
    *    the frame header carries height then width (big-endian)
    *  - WAV: walk RIFF chunks; duration = data size / fmt byte-rate
    * Throws on an unrecognized or torn header — silent zeros would read as
    * a valid tiny file downstream.
    */
  def decodeMedia(r: MediaRow): RealMediaFeatures = {
    val b = r.bytes
    val n = b.length
    if (n >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      require(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R',
        s"media ${r.media_id}: PNG without leading IHDR")
      RealMediaFeatures(r.media_id, r.modality, n,
        width = beInt(b, 16), height = beInt(b, 20), duration_ms = 0)
    } else if (n >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var p = 2
      while (p + 1 < n) {
        require((b(p) & 0xff) == 0xff, s"media ${r.media_id}: bad JPEG marker at $p")
        val m = b(p + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn frame header: len(2) precision(1) height(2) width(2) ...
          require(p + 8 < n, s"media ${r.media_id}: torn JPEG SOF header at $p")
          val h = ((b(p + 5) & 0xff) << 8) | (b(p + 6) & 0xff)
          val w = ((b(p + 7) & 0xff) << 8) | (b(p + 8) & 0xff)
          return RealMediaFeatures(r.media_id, r.modality, n, w, h, 0)
        } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          p += 2 // standalone marker, no length field
        } else {
          // segment with a 2-byte length field — bounds-checked so a
          // truncated stream (e.g. SOI+EOI only) errors cleanly, not AIOOBE
          require(p + 3 < n, s"media ${r.media_id}: torn JPEG segment at $p")
          p += 2 + (((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff))
        }
      }
      sys.error(s"media ${r.media_id}: JPEG without a SOF frame header")
    } else if (n >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
               b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var p = 12
      var byteRate = -1
      var dataSize = -1
      while (p + 8 <= n && (byteRate < 0 || dataSize < 0)) {
        val id = new String(b, p, 4, "US-ASCII")
        val sz = leInt(b, p + 4)
        if (id == "fmt ") {
          require(p + 20 <= n - 4, s"media ${r.media_id}: torn WAV fmt chunk at $p")
          byteRate = leInt(b, p + 8 + 8)
        } else if (id == "data") dataSize = sz
        p += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      require(byteRate > 0 && dataSize >= 0,
        s"media ${r.media_id}: WAV missing fmt/data chunk")
      RealMediaFeatures(r.media_id, r.modality, n, 0, 0,
        (dataSize * 1000L / byteRate).toInt)
    } else sys.error(s"media ${r.media_id}: unrecognized container " +
      s"(${b.take(4).map(x => f"${x & 0xff}%02x").mkString(" ")})")
  }

  /** Synthesize a REAL media table: per-id deterministic dimensions/duration
    * encoded into structurally valid PNG/JPEG/WAV payloads (id mod 3 picks
    * the container). The parameters are pure functions of the id, so an
    * external oracle can recompute every decoded field.
    */
  def synthesizeMediaReal(df: DataFrame, idCol: String,
                          sourceCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"), col(sourceCol).as("source"))
      .as[(Long, String)]
      .map { case (id, source) =>
        val (modality, bytes) = (id % 3) match {
          case 0 => ("png", pngBytes(64 + (id % 576).toInt, 64 + (id % 296).toInt))
          case 1 => ("wav", wavBytes(1000, (1000 * (1 + id % 30)).toInt))
          case _ => ("jpeg", jpegBytes(64 + (id % 576).toInt, 64 + (id % 296).toInt))
        }
        MediaRow(id, modality, bytes, source)
      }
      .toDF()
  }

  /** Batch REAL feature extraction — same typed-mapPartitions plumbing as
    * [[extractFeatures]], but the decoder parses actual container headers.
    */
  def extractFeaturesReal(spark: SparkSession,
                          media: DataFrame): Dataset[RealMediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decodeMedia))
  }
}
