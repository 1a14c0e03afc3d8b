package graft

import graft.index.{Deletes, Tombstones}

/** Tombstone structure + read-path tests: sparse/dense layout selection,
  * million-delete bitmap correctness (the scale path — the driver holds the
  * maxDoc/8-byte bitmap, never a million-entry docId array), and generation
  * naming.
  */
class TombstonesSpec extends SparkTestBase {

  test("sparse layout: membership matches the id set") {
    val ids = Array(3L, 17L, 4095L, 4096L, 999999L)
    val t = Tombstones.ofSorted(ids)
    ids.foreach(d => assert(t.contains(d)))
    Seq(0L, 4L, 4094L, 4097L, 1000000L).foreach(d => assert(!t.contains(d)))
    assert(t.cardinality == ids.length.toLong)
    assert(t.iterator.toSeq == ids.toSeq)
  }

  test("dense bitmap via distributed word aggregation: 10^6 deletes") {
    import spark.implicits._
    val seg = tmpDir("tomb-seg")
    val maxDocId = 2000000L
    // every third doc deleted -> 666,667 ids across two generations, plus a
    // second generation re-deleting an overlapping slice (distinct-merged)
    val g1 = spark.range(0, maxDocId + 1, 3).map(java.lang.Long.valueOf(_))
    Deletes.add(spark, seg, g1)
    val g2 = spark.range(0, 300000, 3).map(java.lang.Long.valueOf(_))
    Deletes.add(spark, seg, g2)

    val t = Deletes.readTombstones(spark, seg, maxDocId)
    assert(!t.isEmpty)
    assert(t.cardinality == (maxDocId / 3 + 1))
    // spot-check membership across the range
    var d = 0L
    while (d <= maxDocId) {
      assert(t.contains(d) == (d % 3 == 0), s"docId $d")
      d += 99991 // prime stride
    }
    assert(!t.contains(maxDocId + 5))
    assert(!t.contains(-1L))
  }

  test("sparse read path: few deletes stay a sorted array and match") {
    import spark.implicits._
    val seg = tmpDir("tomb-sparse")
    Deletes.add(spark, seg, Seq(5L, 900L, 12L).map(java.lang.Long.valueOf).toDS())
    val t = Deletes.readTombstones(spark, seg, 1000000L)
    assert(t.cardinality == 3)
    assert(t.contains(5L) && t.contains(12L) && t.contains(900L) && !t.contains(6L))
  }

  test("generation names are monotonic and collision-free across adds") {
    import spark.implicits._
    val seg = tmpDir("tomb-gens")
    (1 to 4).foreach(i =>
      Deletes.add(spark, seg, Seq(java.lang.Long.valueOf(i.toLong)).toDS()))
    val gens = new java.io.File(seg).listFiles()
      .filter(_.getName.startsWith("deletes_g")).map(_.getName).sorted
    assert(gens.length == 4)
    assert(gens.distinct.length == 4)
    val counters = gens.map(_.stripPrefix("deletes_g").takeWhile(_.isDigit).toLong)
    assert(counters.toSeq == Seq(1L, 2L, 3L, 4L))
    val t = Deletes.readTombstones(spark, seg, 100L)
    assert(t.cardinality == 4)
  }
}
