package graft

import org.apache.spark.sql.SparkSession

import graft.search.{IndexSearcher, Query}

/** Pruned-vs-exhaustive micro-benchmark: times `topK(q, 10)` with dynamic
  * pruning on and off over an existing index, for a set of query shapes
  * (pure OR → WAND, pure AND → block-max conjunction, mixed MUST+SHOULD →
  * the block-max req-opt path). Results are asserted identical before
  * timing — this measures the pruning win, not a behavior change.
  *
  * Usage: runMain graft.PruneBench <indexDir> [trials]
  */
object PruneBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error("usage: PruneBench <indexDir> [trials]"))
    val trials = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val se = IndexSearcher.open(spark, dir)
    val queries = Seq(
      "the OR of OR court"       -> "pure OR (WAND)",
      "the AND of AND court"     -> "pure AND (block-max conjunction)",
      "the AND court OR law"     -> "mixed MUST+SHOULD (req-opt)",
      "the AND of OR court OR law" -> "mixed 2+2 (req-opt)")
    for ((qs, label) <- queries) {
      val q = Query.parse(qs)
      // warm + identity check
      val a = se.topK(q, 10, pruning = true).collect().toSeq
      val b = se.topK(q, 10, pruning = false).collect().toSeq
      require(a == b, s"pruning changed results for $qs")
      def best(pruning: Boolean): Double =
        (1 to trials).map { _ =>
          val t0 = System.nanoTime()
          se.topK(q, 10, pruning = pruning).collect()
          (System.nanoTime() - t0) / 1e3 / 1e3
        }.min
      val on = best(true)
      val off = best(false)
      println(f"[prune] $label%-34s pruned ${on}%7.0f ms   exhaustive ${off}%7.0f ms   speedup ${off / on}%.2fx  ($qs)")
    }
    spark.stop()
  }
}
