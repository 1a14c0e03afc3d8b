package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.{Hnsw, Similarity}

/** HNSW-vs-brute-force micro-benchmark at vector counts the sf tables don't
  * reach: N deterministic synthetic vectors (splitmix64 — no RNG state, so
  * the corpus is identical across parallelism levels), per-partition graph
  * build + fan-out query timed separately from the exact brute-force scan,
  * recall\@k reported for each trial. This is the evidence for the scale
  * claim in OPERATORS.md: query cost tracks ef·log(partition size) per
  * partition while brute force pays the full scan, with the graph build a
  * one-time, embarrassingly parallel cost (ref shape:
  * `util/hnsw/HnswGraphBuilder.java` per segment).
  *
  * Usage: runMain graft.HnswBench [nVecs] [dim] [queries]
  */
object HnswBench {

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Gaussian-ish clustered vector from the row id: 32 cluster centers,
    * sum-of-uniforms noise (CLT) — clustered data is the regime where graph
    * pruning has structure to exploit, like real embeddings.
    */
  private def vec(id: Long, dim: Int): Array[Float] = {
    val c = (mix(id) % 32).toInt.abs
    Array.tabulate(dim) { j =>
      val center = ((mix(c * 977L + j) % 2001) - 1000) / 500f
      val u1 = ((mix(id * 31 + j * 7 + 1) % 2001) - 1000) / 1000f
      val u2 = ((mix(id * 31 + j * 7 + 2) % 2001) - 1000) / 1000f
      center + 0.35f * (u1 + u2)
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val nq = args.lift(2).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val df = spark.range(n).map(i => (i, vec(i, dim)))
      .toDF("vec_id", "embedding")
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .cache()
    df.count() // materialize so query timings exclude generation

    // one untimed warm query JITs both paths
    val warmQ = vec(-1L, dim)
    Hnsw.topK(df, "vec_id", "embedding", warmQ, 10).count(): Unit
    Similarity.bruteForceTopK(df, "vec_id", "embedding", warmQ, 10).count(): Unit

    // single-query path: graph build is paid per call (the ad-hoc shape)
    var recalls = List.empty[Double]
    var hnswSec, bruteSec = 0.0
    val exactSets = (1 to nq).map { qi =>
      val q = vec(-100L - qi, dim)
      val (approx, tH) = Bench.timed(
        Hnsw.topK(df, "vec_id", "embedding", q, 10)
          .select($"id").as[Long].collect().toSet)
      val (exact, tB) = Bench.timed(
        Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 10)
          .select($"vec_id").as[Long].collect().toSet)
      hnswSec += tH; bruteSec += tB
      recalls ::= (approx & exact).size.toDouble / exact.size
      println(f"[hnsw] q$qi hnsw=${tH}%.2fs brute=${tB}%.2fs recall=${recalls.head}%.2f")
      (-100L - qi) -> exact
    }.toMap

    // batch path: ONE graph build per partition answers the whole batch
    // (knnJoin) — the amortized cost a retrieval pipeline actually pays
    val qdf = spark.createDataset((1 to nq).map(qi => (-100L - qi, vec(-100L - qi, dim))))
      .toDF("vec_id", "embedding")
    val (joined, tJoin) = Bench.timed(
      Hnsw.knnJoin(df, "vec_id", "embedding", qdf, "vec_id", "embedding", k = 10)
        .select($"qid", $"id").as[(Long, Long)].collect())
    val joinRec = joined.groupBy(_._1).map { case (qid, rows) =>
      val got = rows.map(_._2).toSet
      (got & exactSets(qid)).size.toDouble / exactSets(qid).size
    }
    val rec = recalls.sum / recalls.size
    val jrec = joinRec.sum / joinRec.size
    println(f"[hnsw] knnJoin: $nq queries in $tJoin%.2fs (${tJoin / nq}%.2fs/q amortized) recall=$jrec%.2f")
    println(
      f"""{"hnsw_bench":{"n":$n,"dim":$dim,"queries":$nq,"hnsw_sec_per_q":${hnswSec / nq}%.3f,"join_sec_per_q":${tJoin / nq}%.3f,"brute_sec_per_q":${bruteSec / nq}%.3f,"mean_recall":$rec%.3f,"join_recall":$jrec%.3f}}""")
    spark.stop()
  }
}
