package graft.index

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** In-place numeric doc-values updates — the re-expression of the
  * reference's `IndexWriter#updateNumericDocValue`
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/index/IndexWriter.java`,
  * applied via per-field doc-values generations in
  * `index/ReadersAndUpdates.java`): a stored numeric field of an already
  * committed segment is patched WITHOUT reindexing by writing a sparse
  * generation file beside the segment; readers overlay the latest
  * generation per doc at open, and merges bake the overlay into the merged
  * row store (after which the patch files are gone, exactly like the
  * reference's DV-generation compaction).
  *
  * Layout: `{segDir}/dvpatch/{field}/g{N}/` Parquet of (docId LOCAL, value
  * LONG). Higher generations win per doc. Scale shape: the overlay is ONE
  * union of the (sparse) patch generations, a `max_by(value, gen)`
  * aggregation keyed by docId — both sized by the number of UPDATED docs,
  * not the corpus — and one equi-join against the docs table that AQE
  * broadcasts while patches are small. Nothing is collected to the driver.
  */
object DocValues {

  private def patchRoot(segDir: String) = s"$segDir/dvpatch"

  /** Fields having at least one patch generation. */
  def patchedFields(segDir: String): Seq[String] = {
    val root = new java.io.File(patchRoot(segDir))
    if (!root.isDirectory) Seq.empty
    else root.listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
  }

  /** (gen, path) pairs for a field, ascending. */
  def gens(segDir: String, field: String): Seq[(Int, String)] = {
    val d = new java.io.File(s"${patchRoot(segDir)}/$field")
    if (!d.isDirectory) Seq.empty
    else d.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("g"))
      .map(f => f.getName.drop(1).toInt -> f.getAbsolutePath)
      .sortBy(_._1).toSeq
  }

  /** Write one update generation for `field`. `patch` must have (docId,
    * value) with SEGMENT-LOCAL docIds; `gen = None` appends after the
    * current latest (pass a fixed gen for idempotent replays). Returns the
    * generation written.
    */
  def update(spark: SparkSession, segDir: String, field: String,
      patch: DataFrame, gen: Option[Int] = None): Int = {
    val g = gen.getOrElse(gens(segDir, field).lastOption.map(_._1).getOrElse(0) + 1)
    patch.select(col("docId").cast("long").as("docId"),
        col("value").cast("long").as("value"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${patchRoot(segDir)}/$field/g$g")
    g
  }

  /** Overlay every patched field of `segDir` onto `base` (a docs-table
    * DataFrame with segment-local docIds). The latest generation wins per
    * doc; unpatched docs keep their stored value; the patch value is cast
    * to the stored column's type.
    */
  def overlay(spark: SparkSession, base: DataFrame, segDir: String): DataFrame = {
    import spark.implicits._
    patchedFields(segDir).foldLeft(base) { (df, field) =>
      if (!df.columns.contains(field)) df
      else {
        val pat = gens(segDir, field).map { case (g, p) =>
          spark.read.parquet(p).select($"docId", $"value", lit(g).as("gen"))
        }.reduce(_ unionByName _)
        val latest = pat.groupBy($"docId")
          .agg(max_by($"value", $"gen").as("__dv"))
        val t = df.schema(field).dataType
        df.join(latest, Seq("docId"), "left")
          .withColumn(field, coalesce($"__dv".cast(t), col(field)))
          .drop("__dv")
      }
    }
  }

  /** The segment's docs table with all doc-values updates applied — the
    * read path every searcher and merge uses.
    */
  def readDocs(spark: SparkSession, segDir: String): DataFrame =
    overlay(spark, spark.read.parquet(s"$segDir/docs"), segDir)

  /** Coalesce inclusive long ranges: sort by lower bound, merge any pair
    * that overlaps or is ADJACENT (hi + 1 >= next lo) — the reference's
    * SortedNumericDocValuesMultiRangeQuery folds its requested ranges the
    * same way before matching (ref
    * sandbox/search/DocValuesMultiRangeQuery.java, MultiRangeQuery.java
    * mergeOverlappingRanges), so `[10,20] OR [21,30] OR [15,25]` probes one
    * range `[10,30]`.
    */
  def coalesceRanges(ranges: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val valid = ranges.filter { case (lo, hi) => lo <= hi }.sortBy(_._1)
    valid.foldLeft(List.empty[(Long, Long)]) {
      case ((plo, phi) :: rest, (lo, hi)) if phi == Long.MaxValue || lo <= phi + 1 =>
        (plo, math.max(phi, hi)) :: rest
      case (acc, r) => r :: acc
    }.reverse
  }

  /** OR-of-ranges predicate over a numeric doc-values column, coalesced
    * first so the scan probes disjoint intervals only. The predicate is a
    * pure Spark expression — it pushes down to the Parquet scan's min/max
    * pruning (Q17's design: BKD replaced by native range predicates).
    */
  def multiRangePredicate(c: Column, ranges: Seq[(Long, Long)]): Column = {
    val merged = coalesceRanges(ranges)
    require(merged.nonEmpty, "multiRangePredicate needs >= 1 non-empty range")
    merged.map { case (lo, hi) => c >= lo && c <= hi }
      .reduce(_ || _)
  }
}
