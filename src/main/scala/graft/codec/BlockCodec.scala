package graft.codec

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-Scala posting-block codec: delta encoding + FOR bit-packing for docID
  * gaps, patched-FOR (PFor) for term frequencies, VInt tails.
  *
  * The *semantics* mirror the reference codec — 128-value blocks, doc gaps
  * frame-of-reference packed, freqs patched with a bounded number of
  * exceptions, small tails as VInt (ref
  * `/root/reference/lucene/core/src/java/org/apache/lucene/codecs/lucene103/ForUtil.java:32`,
  * `PForUtil.java:28-60`, `Lucene103PostingsFormat.java:186-202`) — but the
  * byte layout is our own: this engine never reads Lucene files, so we keep a
  * simple, JIT-friendly little-endian layout stored in Parquet `BinaryType`
  * columns.
  */
object BlockCodec {

  /** Block size in docs; retained from the reference as the skip/impact
    * granularity (ref `ForUtil.java:32 BLOCK_SIZE=128`).
    */
  val BlockSize = 128

  // ---------------------------------------------------------------- varint

  final class ByteWriter(initial: Int = 64) {
    private var buf = new Array[Byte](initial)
    private var len = 0
    private def ensure(n: Int): Unit = {
      if (len + n > buf.length) {
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
      }
    }
    def writeByte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
    def writeVLong(v0: Long): Unit = {
      var v = v0
      ensure(10)
      while ((v & ~0x7fL) != 0) {
        buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7
      }
      buf(len) = v.toByte; len += 1
    }
    def writeBytes(bs: Array[Byte]): Unit = {
      ensure(bs.length)
      System.arraycopy(bs, 0, buf, len, bs.length); len += bs.length
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  final class ByteReader(buf: Array[Byte]) {
    private var pos = 0
    def readByte(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def readVLong(): Long = {
      var b = buf(pos); pos += 1
      var v = (b & 0x7fL)
      var shift = 7
      while ((b & 0x80) != 0) {
        b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
      }
      v
    }
    def remaining: Int = buf.length - pos
  }

  // ---------------------------------------------------------- bit packing

  /** Pack `count` values at `bitWidth` bits each, little-endian across a long
    * lattice. bitWidth 0 = all zeros, 64 = raw longs.
    */
  def bitPack(values: Array[Long], bitWidth: Int): Array[Byte] = {
    val n = values.length
    if (bitWidth == 0) return Array.emptyByteArray
    val totalBits = n.toLong * bitWidth
    val nLongs = ((totalBits + 63) / 64).toInt
    val words = new Array[Long](nLongs)
    var i = 0
    var bitPos = 0L
    while (i < n) {
      val v = values(i)
      val w = (bitPos >>> 6).toInt
      val off = (bitPos & 63).toInt
      words(w) |= v << off
      if (off + bitWidth > 64) words(w + 1) |= v >>> (64 - off)
      bitPos += bitWidth
      i += 1
    }
    val out = new Array[Byte](nLongs * 8)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    out
  }

  def bitUnpack(bytes: Array[Byte], bitWidth: Int, count: Int): Array[Long] = {
    val out = new Array[Long](count)
    if (bitWidth == 0) return out
    val nLongs = bytes.length / 8
    val words = new Array[Long](nLongs)
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(words)
    val mask = if (bitWidth == 64) -1L else (1L << bitWidth) - 1
    var i = 0
    var bitPos = 0L
    while (i < count) {
      val w = (bitPos >>> 6).toInt
      val off = (bitPos & 63).toInt
      var v = words(w) >>> off
      if (off + bitWidth > 64) v |= words(w + 1) << (64 - off)
      out(i) = v & mask
      bitPos += bitWidth
      i += 1
    }
    out
  }

  private def bitsRequired(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  // ------------------------------------------------- FOR (doc-gap blocks)

  /** Frame-of-reference encode: [vlong count][byte width][packed]. Values must
    * be non-negative. Used for docID gaps (already delta'd).
    */
  def forEncode(values: Array[Long]): Array[Byte] = {
    val w = new ByteWriter(values.length + 8)
    w.writeVLong(values.length.toLong)
    var max = 0L
    var i = 0
    while (i < values.length) { if (values(i) > max) max = values(i); i += 1 }
    val width = bitsRequired(max)
    w.writeByte(width)
    w.writeBytes(bitPack(values, width))
    w.result()
  }

  def forDecode(bytes: Array[Byte]): Array[Long] = {
    val r = new ByteReader(bytes)
    val count = r.readVLong().toInt
    val width = r.readByte()
    val nLongs = ((count.toLong * width + 63) / 64).toInt
    val packed = new Array[Byte](nLongs * 8)
    System.arraycopy(bytes, bytes.length - packed.length, packed, 0, packed.length)
    bitUnpack(packed, width, count)
  }

  // ----------------------------------------------- PFor (freq blocks)

  /** Max patched exceptions per block (ref `PForUtil.java:28-33`). */
  val MaxExceptions = 7

  /** Patched frame-of-reference: pick the smallest width such that at most
    * [[MaxExceptions]] values exceed it; those values' high bits are patched
    * on decode. Layout: [vlong count][byte width][byte nExc]
    * [packed low bits][(byte pos, vlong highBits)*nExc].
    */
  def pforEncode(values: Array[Long]): Array[Byte] = {
    val n = values.length
    require(n <= 256, s"pfor block too large: $n")
    val widths = new Array[Int](n)
    var i = 0
    while (i < n) { widths(i) = bitsRequired(values(i)); i += 1 }
    val sortedW = widths.clone()
    java.util.Arrays.sort(sortedW)
    val maxW = if (n == 0) 0 else sortedW(n - 1)
    // smallest width covering all but <= MaxExceptions values
    val cutIdx = math.max(0, n - 1 - MaxExceptions)
    var width = if (n == 0) 0 else sortedW(cutIdx)
    if (width == maxW) width = maxW
    val low = new Array[Long](n)
    var excPos = new scala.collection.mutable.ArrayBuffer[Int]
    val mask = if (width == 64) -1L else (1L << width) - 1
    i = 0
    while (i < n) {
      low(i) = values(i) & mask
      if (widths(i) > width) excPos += i
      i += 1
    }
    val w = new ByteWriter(n + 16)
    w.writeVLong(n.toLong)
    w.writeByte(width)
    w.writeByte(excPos.length)
    w.writeBytes(bitPack(low, width))
    excPos.foreach { p =>
      w.writeByte(p)
      w.writeVLong(values(p) >>> width)
    }
    w.result()
  }

  def pforDecode(bytes: Array[Byte]): Array[Long] = {
    val r = new ByteReader(bytes)
    val count = r.readVLong().toInt
    val width = r.readByte()
    val nExc = r.readByte()
    val nBytes = (((count.toLong * width + 63) / 64) * 8).toInt
    // packed section starts right after the 3-field header; recompute offset
    // by re-walking the header length
    val headerLen = {
      val probe = new ByteWriter(8)
      probe.writeVLong(count.toLong); probe.writeByte(width); probe.writeByte(nExc)
      probe.result().length
    }
    val packed = new Array[Byte](nBytes)
    System.arraycopy(bytes, headerLen, packed, 0, nBytes)
    val out = bitUnpack(packed, width, count)
    var off = headerLen + nBytes
    val tail = new ByteReader(java.util.Arrays.copyOfRange(bytes, off, bytes.length))
    var e = 0
    while (e < nExc) {
      val p = tail.readByte()
      val hi = tail.readVLong()
      out(p) |= hi << width
      e += 1
    }
    out
  }

  // ---------------------------------------------------------- deltas

  /** Gap-encode a strictly-increasing docID array against `base` (the last
    * docID of the previous block; -1 for the first block) — ref
    * `Lucene103PostingsWriter.java:256-297` (`docDelta = docID - lastDocID`).
    */
  def deltaEncode(sortedIds: Array[Long], base: Long): Array[Long] = {
    val out = new Array[Long](sortedIds.length)
    var prev = base
    var i = 0
    while (i < sortedIds.length) {
      out(i) = sortedIds(i) - prev
      prev = sortedIds(i)
      i += 1
    }
    out
  }

  def deltaDecode(deltas: Array[Long], base: Long): Array[Long] = {
    val out = new Array[Long](deltas.length)
    var acc = base
    var i = 0
    while (i < deltas.length) {
      acc += deltas(i)
      out(i) = acc
      i += 1
    }
    out
  }
}
