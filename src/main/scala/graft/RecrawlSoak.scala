package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{Deletes, IndexBuilder, IndexConfig, LiveSet, SegmentMerger}
import graft.search.{CombinedFieldQuery, IndexSearcher, Precision, Query, TermQuery}

/** Anchor-BM25F search under recrawl churn — the reference's NRT story
  * driven end-to-end by its own directives: a two-field (body + inlink
  * anchor) index absorbs recrawl snapshots batch by batch through
  * `UrlOps.recrawlDiff` (gone/changed tombstone, new/changed land as a
  * fresh segment), the live set merges, and after EVERY batch the anchor-
  * boosted ranking is asserted rank-identical to a from-scratch rebuild of
  * the same snapshot (urls AND 6-dp scores — the merge purges tombstones,
  * so collection stats match the fresh build exactly).
  *
  * `RecrawlSoakSpec` runs it small with identity assertions on; the
  * [[main]] runs it at 50k pages (the sf1.0 doc count) for the
  * BENCH/BASELINE.md row.
  */
object RecrawlSoak {

  private val Vocab = Vector("data", "query", "stream", "table", "index",
    "court", "law", "state", "web", "crawl", "rank", "page")

  /** Deterministic page state at churn version `v` (pure function). */
  def body(i: Long, v: Int): String = {
    val w1 = Vocab((i % Vocab.size).toInt)
    val w2 = Vocab(((i / 3 + v) % Vocab.size).toInt)
    val w3 = Vocab(((i * 7 + 1) % Vocab.size).toInt)
    s"$w1 $w2 $w3 body$i v$v filler${i % 5}"
  }

  def anchor(i: Long): String =
    if (i % 4 == 0) "" // some pages have no inlinks
    else Vocab(((i * 5 + 2) % Vocab.size).toInt) +
      (if (i % 3 == 0) " data" else "")

  def url(i: Long): String = f"https://s${i % 9}.example.com/p/$i%08d"

  /** Snapshot at batch `b` over base size `n`: every 10th page (rotating by
    * batch) changed, every 97th gone, 2% new per batch.
    */
  def snapshot(n: Long, b: Int): Map[Long, Int] = {
    val alive = (0L until n).filter(i => !(1 to b).exists(k => i % 97 == k % 97 && i % 2 == 0))
    val base = alive.map(i => i -> (0 to b).count(k => k > 0 && i % 10 == k % 10)).toMap
    val added = (1 to b).flatMap(k =>
      (n + (k - 1) * n / 50) until (n + k.toLong * n / 50)).map(_ -> 0)
    base ++ added
  }

  private def pagesDf(spark: SparkSession, snap: Map[Long, Int]) = {
    import spark.implicits._
    spark.createDataset(snap.toSeq.sortBy(_._1).map { case (i, v) =>
      (url(i), Seq("body" -> body(i, v), "anchor" -> anchor(i)))
    })
  }

  private def fpDf(spark: SparkSession, snap: Map[Long, Int]) = {
    import spark.implicits._
    spark.createDataset(snap.toSeq.sortBy(_._1).map { case (i, v) =>
      (url(i), s"${body(i, v)}|${anchor(i)}")
    }).toDF("url", "raw").select($"url", md5($"raw").as("fp"))
  }

  /** Ranked (url, 6-dp score) lists for the probe queries. */
  def ranked(se: IndexSearcher, k: Int = 20): Seq[Seq[(String, Double)]] = {
    val queries: Seq[Query] = Seq(
      CombinedFieldQuery("data", Seq("anchor" -> 2.0, "body" -> 1.0)),
      CombinedFieldQuery("query", Seq("anchor" -> 2.0, "body" -> 1.0)),
      TermQuery(graft.index.FieldKey.encode("body", "court")))
    queries.map { q =>
      se.fetchDocs(se.topK(q, k).collect())
        .select(col("url"), round(col("score"), 6).as("score"))
        .collect().map(r => (r.getString(0), r.getDouble(1)))
        .sortBy { case (u, s) => (-s, u) }.toSeq
    }
  }

  /** Runs `batches` churn rounds; returns (per-batch update seconds,
    * per-batch search seconds). `assertIdentity` compares every batch's
    * ranking to a from-scratch rebuild (spec mode).
    */
  def run(spark: SparkSession, workDir: String, n: Long, batches: Int,
          assertIdentity: Boolean): (Seq[Double], Seq[Double]) = {
    import spark.implicits._
    val cfg = IndexConfig(bucketShift = 12, numPostingPartitions = 8,
      numDocPartitions = 4)
    val dir = s"$workDir/live"
    IndexBuilder.buildSegmentFields(pagesDf(spark, snapshot(n, 0)), s"$dir/seg0", cfg)
    LiveSet.add(dir, Seq("seg0"))
    val updSecs = Seq.newBuilder[Double]
    val schSecs = Seq.newBuilder[Double]
    for (b <- 1 to batches) {
      val prevSnap = snapshot(n, b - 1)
      val nextSnap = snapshot(n, b)
      val (_, updSec) = Bench.timed {
        val diff = graft.pipeline.UrlOps.recrawlDiff(
          fpDf(spark, prevSnap), fpDf(spark, nextSnap), "url", "fp")
        val stale = diff.where($"status".isin("gone", "changed"))
          .select($"curl").as[String].collect().toSeq
        LiveSet.manifests(dir).foreach(m => Deletes.deleteByUrls(spark, m.dir, stale))
        val freshUrls = diff.where($"status".isin("new", "changed"))
          .select($"curl").as[String].collect().toSet
        val fresh = pagesDf(spark, nextSnap).filter(p => freshUrls.contains(p._1))
        IndexBuilder.buildSegmentFields(fresh, s"$dir/seg$b", cfg)
        LiveSet.add(dir, Seq(s"seg$b"))
        // full merge: purges the batch's tombstones, recomputes stats —
        // post-merge the live set is equivalent to a fresh build
        val live = LiveSet.manifests(dir)
        if (live.size > 1) {
          val names = live.map(m => new java.io.File(m.dir).getName)
          // multiField: the merge must re-encode per-field stats/norms like
          // the builds did, or the searcher's collection stats diverge
          SegmentMerger.merge(spark, live.map(_.dir), s"$dir/m$b",
            cfg.copy(multiField = true))
          LiveSet.swap(dir, names, Seq(s"m$b"))
          LiveSet.gcOrphans(dir): Unit
        }
      }
      updSecs += updSec
      val se = IndexSearcher.open(spark, dir, precision = Precision.DoubleOracle)
      val (_, schSec) = Bench.timed(ranked(se))
      schSecs += schSec
      if (assertIdentity) {
        // COMPLETE ranking (k = corpus size): a top-k cut would break ties
        // by docId, and docIds legitimately differ between the merged and
        // fresh layouts — the identity claim is about (url, score) ranks
        val kAll = nextSnap.size + 1
        val got = ranked(se, kAll)
        val freshDir = s"$workDir/fresh$b"
        IndexBuilder.buildSegmentFields(pagesDf(spark, nextSnap), s"$freshDir/seg0", cfg)
        LiveSet.add(freshDir, Seq("seg0"))
        val fe = IndexSearcher.open(spark, freshDir, precision = Precision.DoubleOracle)
        val want = ranked(fe, kAll)
        require(got == want,
          s"batch $b: NRT ranking diverged from the fresh rebuild\n got=$got\nwant=$want")
      }
    }
    (updSecs.result(), schSecs.result())
  }

  /** Bench mode: 50k pages (the sf1.0 doc count), 3 batches, identity
    * check on the final batch only (the spec asserts every batch at small
    * n). Prints one JSON line for BENCH/BASELINE.md.
    */
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val batches = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-recrawl-soak")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val workDir = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val (_, buildSec) = Bench.timed {
      val (upd, sch) = run(spark, workDir, n, batches, assertIdentity = false)
      println(f"""{"soak":{"n":$n,"batches":$batches,"update_sec":[${upd.map(s => f"$s%.2f").mkString(",")}],"search_sec":[${sch.map(s => f"$s%.3f").mkString(",")}]}}""")
    }
    // identity gate at scale: one fresh rebuild against the final state
    val se = IndexSearcher.open(spark, s"$workDir/live",
      precision = Precision.DoubleOracle)
    val freshDir = s"$workDir/freshFinal"
    import spark.implicits._
    val snap = snapshot(n, batches)
    IndexBuilder.buildSegmentFields(
      spark.createDataset(snap.toSeq.sortBy(_._1).map { case (i, v) =>
        (url(i), Seq("body" -> body(i, v), "anchor" -> anchor(i)))
      }), s"$freshDir/seg0",
      IndexConfig(bucketShift = 12, numPostingPartitions = 8, numDocPartitions = 4))
    LiveSet.add(freshDir, Seq("seg0"))
    val fe = IndexSearcher.open(spark, freshDir, precision = Precision.DoubleOracle)
    val kAll = snap.size + 1 // complete ranking: tie-robust identity
    val ok = ranked(se, kAll) == ranked(fe, kAll)
    println(s"""{"soak_rank_identity":$ok,"total_sec":${f"$buildSec%.1f"}}""")
    require(ok, "rank identity failed at scale")
    spark.stop()
  }
}
