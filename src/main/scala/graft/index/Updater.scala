package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Update-by-key — the re-expression of `IndexWriter.updateDocument`
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:1507`:
  * delete-by-term + add, published together at the next commit/reopen).
  *
  * Protocol over the [[LiveSet]] commit point (single writer, reader
  * visibility at reopen — the reference's NRT semantics):
  *
  *  1. build the replacement segment (its own manifest commit = resume-safe);
  *  2. add it to the live set (atomic generation swap);
  *  3. tombstone every doc with a matching url in the OTHER live segments.
  *
  * A reader that reopens after step 3 sees exactly one version per url. A
  * crash inside the window is recovered by re-running the same update batch:
  * step 1 resumes from the manifest, step 2 is an idempotent add, and step 3
  * re-applies (duplicate tombstones distinct-merge away). This mirrors the
  * streaming checkpoint-replay model rather than the reference's buffered
  * in-RAM deletes.
  */
object Updater {

  /** Replace (or insert) the given (url, text) docs. Returns the new
    * segment's manifest.
    *
    * @param segName replacement segment dir name; must be deterministic per
    *   update batch so a replay resumes instead of duplicating.
    */
  def updateByUrls(
      spark: SparkSession,
      indexDir: String,
      segName: String,
      pages: Dataset[(String, String)],
      cfg: IndexConfig
  ): SegmentManifest = {
    val m = IndexBuilder.buildSegment(pages, s"$indexDir/$segName", cfg)
    LiveSet.add(indexDir, Seq(segName))
    val urls = pages.toDF("url", "text").select("url")
    LiveSet.manifests(indexDir)
      .filter(s => new java.io.File(s.dir).getName != segName)
      .foreach { seg =>
        import spark.implicits._
        val ids = spark.read.parquet(s"${seg.dir}/docs")
          .join(urls, "url")
          .select($"docId")
        if (ids.limit(1).count() > 0)
          Deletes.add(spark, seg.dir, ids.as[java.lang.Long])
      }
    m
  }
}
