package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Tombstones — the re-expression of the reference's liveDocs
  * (`codecs/lucene90/Lucene90LiveDocsFormat`, `index/PendingDeletes`):
  * deletes against a committed segment are recorded as generation-stamped
  * docId tables next to it; readers hide tombstoned docs (collection stats
  * intentionally stay stale, as in the reference), and merges purge them
  * physically. Between merges the tombstone set is bounded, so readers ship
  * it as a sorted broadcast array; at larger delete volumes the same layout
  * feeds a bitmap/bloom broadcast instead.
  */
object Deletes {

  private val Prefix = "deletes_g"

  private def gens(dir: String): Seq[java.io.File] = {
    val f = new java.io.File(dir)
    if (!f.isDirectory) Seq.empty
    else f.listFiles().filter(x => x.isDirectory && x.getName.startsWith(Prefix))
      .sortBy(_.getName).toSeq
  }

  /** Record segment-local docIds as deleted (new generation, atomic-enough:
    * a generation becomes visible only once its parquet commit completes).
    * Generation names are a monotonic counter derived from the existing
    * generations (max + 1) with a random suffix — nanoTime origins are
    * arbitrary per JVM, so two processes (or a restart) could otherwise
    * collide or interleave out of order.
    */
  def add(spark: SparkSession, segDir: String, docIds: Dataset[java.lang.Long]): Unit = {
    val next = gens(segDir).map { g =>
      val digits = g.getName.stripPrefix(Prefix).takeWhile(_.isDigit)
      if (digits.isEmpty) 0L else BigInt(digits).min(BigInt(Long.MaxValue - 1)).toLong
    }.foldLeft(0L)(math.max) + 1
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    val gen = f"$Prefix$next%020d_$suffix"
    docIds.toDF("docId").write.parquet(s"$segDir/$gen")
  }

  /** Delete by stored url (the practical API — urls are the stable key). */
  def deleteByUrls(spark: SparkSession, segDir: String, urls: Seq[String]): Long = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$segDir/docs")
      .where($"url".isin(urls: _*))
      .select($"docId")
    val n = ids.count()
    if (n > 0) add(spark, segDir, ids.as[java.lang.Long])
    n
  }

  /** All tombstoned docIds of a segment, sorted (empty array = none). */
  def readSorted(spark: SparkSession, segDir: String): Array[Long] = {
    val gs = gens(segDir)
    if (gs.isEmpty) Array.emptyLongArray
    else {
      import spark.implicits._
      gs.map(g => spark.read.parquet(g.getPath))
        .reduce(_ unionByName _)
        .select(col("docId").cast("long"))
        .distinct()
        .as[Long].collect().sorted
    }
  }

  /** Segment tombstones as a compact [[Tombstones]] structure. Sparse
    * delete sets (< 1/64 of the docId space) collect as a sorted array;
    * dense sets aggregate to 64-bit bitmap words *distributed*
    * (`groupBy(docId/64).agg(bit_or)`), so the driver materializes maxDoc/8
    * bytes of bitmap — never the raw docId list — before broadcasting.
    */
  def readTombstones(spark: SparkSession, segDir: String, maxDocId: Long): Tombstones = {
    val gs = gens(segDir)
    if (gs.isEmpty) Tombstones.Empty
    else {
      import spark.implicits._
      val ids = gs.map(g => spark.read.parquet(g.getPath))
        .reduce(_ unionByName _)
        .select(col("docId").cast("long").as("docId"))
        .distinct()
      val n = ids.count()
      // dense bitmap only while it stays driver-reasonable (maxDoc/8 bytes;
      // 2^34 docIds = 2 GB cap) — segments are built 10^8-10^9 docs each,
      // far inside; a degenerate giant segment keeps the sorted array
      val denseCapBits = 1L << 34
      if (n == 0) Tombstones.Empty
      else if (n * 64 < maxDocId + 1 || maxDocId + 1 > denseCapBits) {
        Tombstones.ofSorted(ids.as[Long].collect().sorted)
      } else {
        val pairs = ids
          .groupBy((col("docId") / 64).cast("long").as("w"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(docId % 64 AS INT)))").as("bits"))
          .as[(Long, Long)].collect()
        Tombstones.ofWords(pairs, maxDocId)
      }
    }
  }

  /** Drop all tombstone generations (after a purging merge). */
  def clear(segDir: String): Unit =
    gens(segDir).foreach { g =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(g)
    }
}
