package graft.index

import java.io.ByteArrayOutputStream

/** Delta-gap + variable-byte posting codec.
  *
  * The reference stores fixed-width masked values and truncates them to the
  * minimum safe width (`ComputeTruncateSize`, psi/algorithm/rr22/rr22_psi.cc:41-52);
  * psispark's analog is classic IR posting compression: sorted docIDs are
  * delta-gapped then variable-byte encoded, term frequencies are varbyte
  * encoded directly. Pure JVM code, used inside `mapPartitions` (SURVEY.md §2.8).
  */
object Codec {

  /** Append one unsigned varint (LEB128, 7 bits per byte, little-endian). */
  @inline def writeVLong(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7fL) | 0x80L).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** Encode a strictly-increasing array of longs as delta gaps + varbyte. */
  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(sorted.length * 2 max 16)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      require(i == 0 || v > prev, s"docIds must be strictly increasing, got $v after $prev")
      writeVLong(out, if (i == 0) v else v - prev)
      prev = v
      i += 1
    }
    out.toByteArray
  }

  /** Decode `n` delta-gapped varbyte longs back to absolute values. */
  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val res = new Array[Long](n)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      prev = if (i == 0) v else prev + v
      res(i) = prev
      i += 1
    }
    res
  }

  /** Encode non-negative ints (term frequencies) as plain varbyte. */
  def encodeInts(xs: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(xs.length max 16)
    var i = 0
    while (i < xs.length) {
      require(xs(i) >= 0, "tf must be non-negative")
      writeVLong(out, xs(i).toLong)
      i += 1
    }
    out.toByteArray
  }

  /** Decode `n` varbyte ints. */
  def decodeInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val res = new Array[Int](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      res(i) = v.toInt
      i += 1
    }
    res
  }

  /** Postings per block for block-max metadata. */
  val BlockSize: Int = 128

  /** Per-block first docId (for galloping skip) and per-block max of the
    * BM25 tf-normalization `tf / (tf + k1*(1 - b + b*dlen/avgdl))`, rounded
    * UP to Float so the bound stays admissible.
    */
  def blockMeta(docIds: Array[Long], tfs: Array[Int], dlens: Array[Int],
                k1: Double, b: Double, avgdl: Double): (Array[Long], Array[Float]) = {
    val nBlocks = (docIds.length + BlockSize - 1) / BlockSize
    val firsts = new Array[Long](nBlocks)
    val maxes = new Array[Float](nBlocks)
    var blk = 0
    while (blk < nBlocks) {
      val start = blk * BlockSize
      val end = math.min(start + BlockSize, docIds.length)
      firsts(blk) = docIds(start)
      var m = 0.0
      var i = start
      while (i < end) {
        val tf = tfs(i).toDouble
        val norm = tf / (tf + k1 * (1.0 - b + b * dlens(i) / avgdl))
        if (norm > m) m = norm
        i += 1
      }
      val f = m.toFloat
      maxes(blk) = if (f.toDouble < m) Math.nextUp(f) else f
      blk += 1
    }
    (firsts, maxes)
  }
}
