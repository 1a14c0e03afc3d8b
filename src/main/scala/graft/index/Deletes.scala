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
    */
  def add(spark: SparkSession, segDir: String, docIds: Dataset[java.lang.Long]): Unit = {
    val gen = f"$Prefix${System.nanoTime()}%020d"
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
