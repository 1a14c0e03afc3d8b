package graft.codec

/** Lossy small-float encodings used for document-length norms.
  *
  * Semantics follow the reference's norm encoding
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167`):
  * a positive int is encoded into one byte, exactly for small values and with
  * 4 significant bits above, monotonically. BM25 rank-identity requires the
  * exact same quantization, so the int math here reproduces it bit-for-bit.
  */
object SmallFloat {

  /** Float-like encoding for positive longs preserving order + 4 significant
    * bits (ref `SmallFloat.java:103-127` `longToInt4`).
    */
  def longToInt4(i: Long): Int = {
    require(i >= 0, s"only positive values supported, got $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) i.toInt
    else {
      val shift = numBits - 4
      var encoded = (i >>> shift).toInt
      encoded &= 0x07 // the top bit is implicit
      encoded |= (shift + 1) << 3 // shift 0 is reserved for subnormals
      encoded
    }
  }

  /** Inverse of [[longToInt4]] (ref `SmallFloat.java:129-142`). */
  def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  private val MaxInt4 = longToInt4(Int.MaxValue)
  private val NumFreeValues = 255 - MaxInt4

  /** Encode an int into one byte: exact below [[NumFreeValues]] (= 40),
    * 4-significant-bit quantized above (ref `SmallFloat.java:144-155`).
    */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"only positive values supported, got $i")
    if (i < NumFreeValues) i.toByte
    else (NumFreeValues + longToInt4(i - NumFreeValues)).toByte
  }

  /** Inverse quantization of [[intToByte4]] (ref `SmallFloat.java:157-166`). */
  def byte4ToInt(b: Byte): Int = {
    val i = java.lang.Byte.toUnsignedInt(b)
    if (i < NumFreeValues) i
    else {
      val decoded = NumFreeValues + int4ToLong(i - NumFreeValues)
      Math.toIntExact(decoded)
    }
  }

  /** All 256 decoded lengths, index = unsigned norm byte — the BM25 length
    * table (ref `BM25Similarity.java:111-117`).
    */
  lazy val lengthTable: Array[Int] =
    Array.tabulate(256)(i => byte4ToInt(i.toByte))
}
