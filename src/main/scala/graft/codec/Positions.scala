package graft.codec

/** Positional-postings payload codec: per doc (in block order), that doc's
  * analyzer positions delta-VInt-encoded and concatenated. Doc boundaries
  * are implicit — doc i owns the next `freqs(i)` values — mirroring the
  * reference's .pos stream, which is addressed via per-term freq sums
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/codecs/lucene103/Lucene103PostingsWriter.java:299-345`).
  */
object Positions {

  def encode(perDoc: Array[Array[Int]], n: Int): Array[Byte] = {
    var total = 8
    var d = 0
    while (d < n) { total += perDoc(d).length * 2 + 1; d += 1 }
    val w = new BlockCodec.ByteWriter(total)
    d = 0
    while (d < n) {
      val ps = perDoc(d)
      var prev = 0
      var i = 0
      while (i < ps.length) {
        w.writeVLong((ps(i) - prev).toLong)
        prev = ps(i)
        i += 1
      }
      d += 1
    }
    w.result()
  }

  /** Raw (non-delta) variant for per-position PAYLOAD values (ref
    * `analysis/payloads/PayloadAttribute` — arbitrary per-position
    * metadata): payloads are not monotone within a doc, so each value is
    * VInt-encoded as-is. Doc boundaries stay implicit via freqs, exactly
    * like [[encode]].
    */
  def encodeRaw(perDoc: Array[Array[Int]], n: Int): Array[Byte] = {
    var total = 8
    var d = 0
    while (d < n) { total += perDoc(d).length * 2 + 1; d += 1 }
    val w = new BlockCodec.ByteWriter(total)
    d = 0
    while (d < n) {
      val ps = perDoc(d)
      var i = 0
      while (i < ps.length) { w.writeVLong(ps(i).toLong); i += 1 }
      d += 1
    }
    w.result()
  }

  /** Decode the raw (payload) stream using per-doc freqs as boundaries. */
  def decodeRaw(bytes: Array[Byte], freqs: Array[Long], n: Int): Array[Array[Int]] = {
    val r = new BlockCodec.ByteReader(bytes)
    val out = new Array[Array[Int]](n)
    var d = 0
    while (d < n) {
      val f = freqs(d).toInt
      val ps = new Array[Int](f)
      var i = 0
      while (i < f) { ps(i) = r.readVLong().toInt; i += 1 }
      out(d) = ps
      d += 1
    }
    out
  }

  /** Decode using the block's per-doc freqs as boundaries. */
  def decode(bytes: Array[Byte], freqs: Array[Long], n: Int): Array[Array[Int]] = {
    val r = new BlockCodec.ByteReader(bytes)
    val out = new Array[Array[Int]](n)
    var d = 0
    while (d < n) {
      val f = freqs(d).toInt
      val ps = new Array[Int](f)
      var prev = 0
      var i = 0
      while (i < f) {
        prev += r.readVLong().toInt
        ps(i) = prev
        i += 1
      }
      out(d) = ps
      d += 1
    }
    out
  }
}
