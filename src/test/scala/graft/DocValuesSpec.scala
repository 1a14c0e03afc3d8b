package graft

import org.apache.spark.sql.functions._

import graft.index.{DocValues, IndexBuilder, IndexConfig, Manifest, SegmentMerger}
import graft.search.IndexSearcher

/** In-place numeric doc-values updates (ref `IndexWriter#updateNumericDocValue`
  * + `ReadersAndUpdates` DV generations): sparse patch overlay at read time,
  * later generations win, point lookups see patches, merges bake them in.
  */
class DocValuesSpec extends SparkTestBase {

  private val cfg = IndexConfig(bucketShift = 4, numPostingPartitions = 4,
    numDocPartitions = 2)

  private def build(dir: String, docs: Seq[(String, String)]): Unit = {
    import spark.implicits._
    IndexBuilder.buildSegment(spark.createDataset(docs), dir, cfg)
  }

  private def lengths(se: IndexSearcher): Map[String, Long] = {
    import spark.implicits._
    se.docsTable.select($"url", $"length".cast("long")).as[(String, Long)]
      .collect().toMap
  }

  test("patch overlay: updated docs see the new value, others keep the stored one") {
    import spark.implicits._
    val dir = tmpDir("dv1")
    build(dir, Seq(("u1", "a b c"), ("u2", "a b"), ("u3", "a")))
    val se = new IndexSearcher(spark, Seq(Manifest.read(dir).get))
    assert(lengths(se) == Map("u1" -> 3L, "u2" -> 2L, "u3" -> 1L))

    val ids = spark.read.parquet(s"$dir/docs")
      .where($"url" === "u2").select($"docId", lit(99L).as("value"))
    DocValues.update(spark, dir, "length", ids)
    assert(lengths(se) == Map("u1" -> 3L, "u2" -> 99L, "u3" -> 1L))

    // a later generation wins; the earlier one still applies to other docs
    val ids3 = spark.read.parquet(s"$dir/docs")
      .where($"url".isin("u2", "u3")).select($"docId", lit(7L).as("value"))
    val g = DocValues.update(spark, dir, "length", ids3)
    assert(g == 2)
    assert(lengths(se) == Map("u1" -> 3L, "u2" -> 7L, "u3" -> 7L))

    // point lookups (the .fdt-seek path) see the overlay too
    val u3id = spark.read.parquet(s"$dir/docs")
      .where($"url" === "u3").select($"docId").as[Long].head()
    val pt = se.docsForIds(Seq(u3id)).select($"length".cast("long")).as[Long].head()
    assert(pt == 7L)

    // a patch on a column the docs table doesn't have is ignored
    DocValues.update(spark, dir, "nosuch",
      spark.range(1).select($"id".as("docId"), lit(1L).as("value")))
    assert(lengths(se) == Map("u1" -> 3L, "u2" -> 7L, "u3" -> 7L))
  }

  test("merge bakes patches into the merged row store and drops the patch files") {
    import spark.implicits._
    val root = tmpDir("dv2")
    build(s"$root/a", Seq(("a1", "x y"), ("a2", "x")))
    build(s"$root/b", Seq(("b1", "x y z")))
    val patch = spark.read.parquet(s"$root/a/docs")
      .where($"url" === "a1").select($"docId", lit(50L).as("value"))
    DocValues.update(spark, s"$root/a", "length", patch)

    SegmentMerger.merge(spark, Seq(s"$root/a", s"$root/b"), s"$root/m", cfg)
    val se = new IndexSearcher(spark, Seq(Manifest.read(s"$root/m").get))
    assert(lengths(se) == Map("a1" -> 50L, "a2" -> 1L, "b1" -> 3L))
    assert(DocValues.patchedFields(s"$root/m").isEmpty)
    // merged docs parquet itself carries the baked value (not an overlay)
    val raw = spark.read.parquet(s"$root/m/docs")
      .select($"url", $"length".cast("long")).as[(String, Long)].collect().toMap
    assert(raw("a1") == 50L)
  }

  test("coalesceRanges merges overlap + adjacency; multiRange predicate equivalence") {
    import graft.index.DocValues.{coalesceRanges, multiRangePredicate}
    // overlap, adjacency (hi+1 == lo), containment, gaps, empty ranges
    assert(coalesceRanges(Seq((10L, 20L), (21L, 30L), (15L, 25L))) == Seq((10L, 30L)))
    assert(coalesceRanges(Seq((40L, 50L), (10L, 20L), (22L, 30L))) ==
      Seq((10L, 20L), (22L, 30L), (40L, 50L)))
    assert(coalesceRanges(Seq((10L, 100L), (20L, 30L))) == Seq((10L, 100L)))
    assert(coalesceRanges(Seq((5L, 3L), (1L, 2L))) == Seq((1L, 2L)))
    assert(coalesceRanges(Seq((0L, Long.MaxValue), (7L, 9L))) ==
      Seq((0L, Long.MaxValue))) // no hi+1 overflow
    // predicate over data == brute-force OR of the original ranges
    import spark.implicits._
    val df = (0L until 500L).toDF("v")
    val ranges = Seq((10L, 40L), (41L, 60L), (55L, 80L), (200L, 210L), (9L, 2L))
    val got = df.where(multiRangePredicate($"v", ranges))
      .collect().map(_.getLong(0)).toSet
    val want = (0L until 500L).filter(v =>
      ranges.exists { case (lo, hi) => v >= lo && v <= hi }).toSet
    assert(got == want)
    assertThrows[IllegalArgumentException] {
      multiRangePredicate($"v", Seq((9L, 2L)))
    }
  }
}
