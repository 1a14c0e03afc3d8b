package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.index.{IndexBuilder, IndexConfig}

/** Phase-by-phase build profiler: where does index-build wall time go at a
  * given core count? (diagnosis tool for the scaling-efficiency target)
  * Usage: runMain graft.PhaseProfile <cores> <corpusParquet>
  */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val corpusDir = args(1)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val parts = args.lift(3).map(_.toInt).getOrElse(cores * 2)
    val cfg = IndexConfig(bucketShift = 14,
      numPostingPartitions = parts, numDocPartitions = parts)
    val work = java.nio.file.Files.createTempDirectory("graft-prof").toString

    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusDir))) {
      val n = args.lift(2).map(_.toLong).getOrElse(150000L)
      graft.corpus.Corpus.pages(spark, n).map(p => (p.url, p.text))
        .toDF("url", "text").repartition(64).write.parquet(corpusDir)
    }
    val pages = spark.read.parquet(corpusDir).select($"url", $"text").as[(String, String)]
    val docTokens = phase("assign+tokenize (fused)") {
      val dt = IndexBuilder.assignAndTokenize(pages, cfg)
      dt.persist(StorageLevel.MEMORY_AND_DISK)
      dt.count()
      dt
    }
    phase("docs write") {
      docTokens.select($"docId", $"url", $"length", $"norm")
        .write.mode(SaveMode.Overwrite).parquet(s"$work/docs")
    }
    val blocks = phase("postings shuffle+blocks") {
      val b = IndexBuilder.buildPostings(docTokens, cfg)
      b.persist(StorageLevel.MEMORY_AND_DISK)
      b.count()
      b
    }
    phase("postings write") {
      blocks.write.mode(SaveMode.Overwrite).parquet(s"$work/postings")
    }
    phase("term stats") {
      IndexBuilder.buildTermStats(blocks)
        .write.mode(SaveMode.Overwrite).parquet(s"$work/terms")
    }
    phase("lineage agg") {
      docTokens.groupBy(org.apache.spark.sql.functions.spark_partition_id())
        .count().collect()
    }
    spark.stop()
  }
}
