package graft

import org.apache.spark.sql.SparkSession

/** Quiet alternating A/B latency pin for individual query entries: runs the
  * named entries round-robin (A,B,A,B,…) so box drift (JIT state, page
  * cache, CPU frequency) hits both alike, and reports per-entry median and
  * min over `reps` rounds. Used to adjudicate single-entry bench drifts
  * (the ann_lsh_topk r4 pin, the ft_or_topk r5 pin) — results recorded in
  * BENCH/BASELINE.md.
  *
  * Usage: runMain graft.AbBench <entry[,entry…]> [reps]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val entries = args.headOption.getOrElse("ft_or_topk,ft_and_topk").split(",").toSeq
    val reps = args.lift(1).map(_.toInt).getOrElse(9)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    // warm-up: two untimed rounds (plans, codegen, index cache)
    for (_ <- 1 to 2; e <- entries) qs(e)(spark, sfDir).count(): Unit
    val times = entries.map(_ -> scala.collection.mutable.ArrayBuffer[Double]()).toMap
    for (_ <- 1 to reps; e <- entries) {
      val (_, sec) = Bench.timed(qs(e)(spark, sfDir).count())
      times(e) += sec
    }
    val parts = entries.map { e =>
      val s = times(e).sorted
      f""""$e":{"median":${s(s.length / 2)}%.3f,"min":${s.head}%.3f,"max":${s.last}%.3f}"""
    }
    println(s"""{"ab":{${parts.mkString(",")}},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
