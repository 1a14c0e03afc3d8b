package graft.index

/** Compact per-segment deleted-docs set — the liveDocs complement (ref
  * `/root/reference/lucene/core/src/java/org/apache/lucene/codecs/lucene90/Lucene90LiveDocsFormat.java`
  * stores a fixed bitset per segment). Two layouts chosen by density:
  *
  *  - sparse: sorted docId array, O(log n) membership — 8 bytes/delete;
  *  - dense: word bitmap over `[0, maxDocId]`, O(1) membership — 1 bit/doc
  *    (maxDoc/8 bytes regardless of delete count, the reference's layout).
  *
  * Either way the structure is built once and shipped to executors via a
  * Spark broadcast (one copy per executor), never captured per-task in
  * query closures.
  */
final class Tombstones private (
    private val words: Array[Long], // null in sparse mode
    private val sorted: Array[Long] // null in dense mode
) extends Serializable {

  def isEmpty: Boolean =
    (words eq null) && (sorted eq null)

  def contains(docId: Long): Boolean =
    if (words ne null) {
      val w = (docId >>> 6).toInt
      docId >= 0 && w < words.length && ((words(w) >>> (docId & 63)) & 1L) == 1L
    } else if (sorted ne null) {
      java.util.Arrays.binarySearch(sorted, docId) >= 0
    } else false

  /** Number of tombstoned docs (linear in structure size; diagnostics). */
  def cardinality: Long =
    if (words ne null) {
      var c = 0L; var i = 0
      while (i < words.length) { c += java.lang.Long.bitCount(words(i)); i += 1 }
      c
    } else if (sorted ne null) sorted.length.toLong
    else 0L

  /** All tombstoned docIds in ascending order (iterator; merge/purge path). */
  def iterator: Iterator[Long] =
    if (words ne null)
      (0L until words.length.toLong * 64).iterator.filter(contains)
    else if (sorted ne null) sorted.iterator
    else Iterator.empty
}

object Tombstones {
  val Empty = new Tombstones(null, null)

  /** Sparse (sorted-array) tombstones from an id list. */
  def ofSorted(ids: Array[Long]): Tombstones =
    if (ids.isEmpty) Empty else new Tombstones(null, ids)

  /** Dense bitmap from pre-aggregated (wordIndex, word) pairs — the shape a
    * distributed `groupBy(docId/64).agg(bit_or)` emits, so the driver never
    * holds the raw docId list for dense delete sets.
    */
  def ofWords(pairs: Array[(Long, Long)], maxDocId: Long): Tombstones = {
    if (pairs.isEmpty) return Empty
    val words = new Array[Long](((maxDocId >>> 6) + 1).toInt)
    pairs.foreach { case (i, w) => words(i.toInt) |= w }
    new Tombstones(words, null)
  }
}
