package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-question benchmark: what does `storePositions` add to the index
  * build? Runs the exact `SparkEntry.searcherFor` build over the sf
  * documents table with positions on/off, alternating trials so box drift
  * hits both arms equally. Usage:
  *   runMain graft.PosBench [sfDir] [trialsPerArm]
  */
object PosBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val trials = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-posbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val pages = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(format_string("doc%012d", $"doc_id").as("url"), $"text")
      .as[(String, String)]

    def build(pos: Boolean): Double = {
      val dir = java.nio.file.Files.createTempDirectory("graft-posab").toString
      val cfg = graft.index.IndexConfig(bucketShift = 8,
        numPostingPartitions = 8, numDocPartitions = 4, storePositions = pos)
      val t0 = System.nanoTime()
      graft.index.IndexBuilder.buildSegment(pages, s"$dir/seg0", cfg)
      val sec = (System.nanoTime() - t0) / 1e9
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
      sec
    }

    build(false) // JIT/codegen warm-up, untimed
    val on = scala.collection.mutable.ArrayBuffer[Double]()
    val off = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to trials).foreach { i =>
      off += build(false)
      on += build(true)
      println(f"[posab] trial $i: off=${off.last}%.2fs on=${on.last}%.2fs")
    }
    val mOff = off.min
    val mOn = on.min
    println(f"[posab] best-of-$trials: positions OFF ${mOff}%.2fs, " +
      f"ON ${mOn}%.2fs, overhead ${(mOn / mOff - 1) * 100}%.1f%%")
    spark.stop()
  }
}
