package graft.codec

/** Per-block competitive (freq, norm) pairs — "impacts" — used to compute
  * block-max score upper bounds for WAND pruning.
  *
  * Semantics follow the reference's competitive-impact skyline
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/codecs/CompetitiveImpactAccumulator.java:65-124`):
  * a pair (f1, n1) makes (f2, n2) non-competitive when f1 >= f2 and n1 <= n2
  * (same-or-higher frequency in a same-or-shorter document can only score
  * same-or-higher under BM25). The retained frontier is strictly increasing
  * in both freq and norm.
  */
object Impacts {

  /** One competitive (termFreq, normByte) pair. `norm` is the unsigned value
    * of the encoded norm byte (0..255).
    */
  final case class Impact(freq: Int, norm: Int)

  /** Reduce raw per-doc (freq, norm) pairs to the competitive frontier,
    * sorted by freq asc / norm asc.
    */
  def skyline(pairs: Iterable[(Int, Int)]): Array[Impact] = {
    if (pairs.isEmpty) return Array.empty
    // max freq per norm
    val maxFreqByNorm = new java.util.TreeMap[Int, Int]()
    pairs.foreach { case (f, n) =>
      if (f > maxFreqByNorm.getOrDefault(n, -1)) maxFreqByNorm.put(n, f)
    }
    // walk norms ascending; keep only pairs whose freq strictly exceeds every
    // smaller-norm pair's freq (otherwise dominated)
    val out = new scala.collection.mutable.ArrayBuffer[Impact]
    var bestFreq = -1
    val it = maxFreqByNorm.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > bestFreq) {
        out += Impact(e.getValue, e.getKey)
        bestFreq = e.getValue
      }
    }
    out.toArray
  }

  /** Primitive-array skyline for the build hot path: no per-pair boxing
    * (norm bytes bucket into a 256-slot max-freq table). Semantics identical
    * to [[skyline]].
    */
  def skylineInts(freqs: Array[Long], norms: Array[Int], n: Int): Array[Impact] = {
    val maxFreq = new Array[Int](256)
    java.util.Arrays.fill(maxFreq, -1)
    var i = 0
    while (i < n) {
      val nm = norms(i) & 0xff
      val f = freqs(i).toInt
      if (f > maxFreq(nm)) maxFreq(nm) = f
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Impact](4)
    var best = -1
    var nm = 0
    while (nm < 256) {
      if (maxFreq(nm) > best) { out += Impact(maxFreq(nm), nm); best = maxFreq(nm) }
      nm += 1
    }
    out.toArray
  }

  /** Serialize impacts as interleaved VInts: [vlong n][(vlong freq, vlong norm)*]. */
  def encode(impacts: Array[Impact]): Array[Byte] = {
    val w = new BlockCodec.ByteWriter(impacts.length * 3 + 4)
    w.writeVLong(impacts.length.toLong)
    impacts.foreach { im => w.writeVLong(im.freq.toLong); w.writeVLong(im.norm.toLong) }
    w.result()
  }

  def decode(bytes: Array[Byte]): Array[Impact] = {
    val r = new BlockCodec.ByteReader(bytes)
    val n = r.readVLong().toInt
    Array.fill(n)(Impact(r.readVLong().toInt, r.readVLong().toInt))
  }

  /** Upper-bound the BM25 score of any doc in a block given its impacts:
    * the max over the frontier of score(freq, norm) — ref
    * `search/MaxScoreCache.java:57-149`.
    */
  def maxScore(impacts: Array[Impact], score: (Int, Int) => Double): Double = {
    var best = 0.0
    var i = 0
    while (i < impacts.length) {
      val s = score(impacts(i).freq, impacts(i).norm)
      if (s > best) best = s
      i += 1
    }
    best
  }
}
