package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Hnsw, Similarity}

/** HNSW per-partition graph: exact-mode identity vs brute force, recall at
  * production parameters, determinism across runs, and the exclude/edge
  * paths. Ref shape: `util/hnsw/HnswGraphBuilder.java` (one graph per
  * segment ~ one per partition here).
  */
class HnswSpec extends SparkTestBase {

  private def corpus(n: Int, dim: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // a few gaussian clusters so neighborhoods are non-trivial
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    (0L until n.toLong).map { id =>
      val c = centers((id % 8).toInt)
      val v = c.zip(Array.fill(dim)(rnd.nextGaussian() * 0.3)).map { case (a, b) => (a + b).toFloat }
      (id, v)
    }.toDF("vec_id", "embedding").repartition(4, col("vec_id"))
  }

  private def queryVec(dim: Int): Array[Float] = {
    val rnd = new scala.util.Random(13)
    Array.fill(dim)(rnd.nextGaussian().toFloat)
  }

  test("exact mode (efSearch=MaxValue) equals brute-force top-k") {
    val df = corpus(600, 12).cache()
    val q = queryVec(12)
    val got = Hnsw.topK(df, "vec_id", "embedding", q, 15, efSearch = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
    df.unpersist()
  }

  test("exact mode with excludeId drops the seed and still matches brute force") {
    val df = corpus(300, 8).cache()
    import spark.implicits._
    val q = df.where($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val got = Hnsw.topK(df, "vec_id", "embedding", q, 10,
      efSearch = Int.MaxValue, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 10, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
    assert(!got.exists(_._1 == 0L))
    df.unpersist()
  }

  test("production parameters reach recall >= 0.8 on clustered vectors") {
    val df = corpus(1000, 12).cache()
    val q = queryVec(12)
    val row = Hnsw.recall(df, "vec_id", "embedding", q, 10, recallFloor = 0.8)
      .collect().head
    assert(row.getDouble(2) >= 0.8)
    assert(row.getInt(1) == 10)
    df.unpersist()
  }

  test("approximate search is deterministic across runs") {
    val df = corpus(500, 10).cache()
    val q = queryVec(10)
    val a = Hnsw.topK(df, "vec_id", "embedding", q, 10).collect().toSeq
    val b = Hnsw.topK(df, "vec_id", "embedding", q, 10).collect().toSeq
    assert(a == b)
    df.unpersist()
  }

  test("k larger than the corpus returns every row, exact order") {
    val df = corpus(20, 6).cache()
    val q = queryVec(6)
    val got = Hnsw.topK(df, "vec_id", "embedding", q, 50, efSearch = Int.MaxValue)
      .collect().map(_.getLong(0)).toSeq
    val want = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 50)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
    assert(got.size == 20)
    df.unpersist()
  }

  test("knnJoin exact mode equals per-query brute force for every query") {
    val df = corpus(400, 10).cache()
    import spark.implicits._
    val qs = df.where($"vec_id" < 4)
    val got = Hnsw.knnJoin(df, "vec_id", "embedding", qs, "vec_id", "embedding",
        k = 8, efSearch = Int.MaxValue, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (-t._3, t._2)).toSeq).toMap
    (0L until 4L).foreach { qid =>
      val q = df.where($"vec_id" === qid).select($"embedding").as[Array[Float]].head()
      val want = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 8, excludeId = Some(qid))
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1))).toSeq
      assert(got(qid) == want, s"qid=$qid")
    }
    df.unpersist()
  }

  test("knnJoin at production parameters keeps recall >= 0.8 per query") {
    val df = corpus(800, 12).cache()
    import spark.implicits._
    val qs = df.where($"vec_id" < 5)
    val approx = Hnsw.knnJoin(df, "vec_id", "embedding", qs, "vec_id", "embedding",
        k = 10, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0L until 5L).foreach { qid =>
      val q = df.where($"vec_id" === qid).select($"embedding").as[Array[Float]].head()
      val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 10, excludeId = Some(qid))
        .collect().map(_.getLong(0)).toSet
      val rec = (approx(qid) & exact).size.toDouble / exact.size
      assert(rec >= 0.8, s"qid=$qid recall=$rec")
    }
    df.unpersist()
  }

  test("level assignment is deterministic and geometric-ish") {
    val levels = (0L until 2000L).map(id => Hnsw.levelOfForTest(id, 42L, 1.0 / math.log(16.0)))
    assert(levels == (0L until 2000L).map(id => Hnsw.levelOfForTest(id, 42L, 1.0 / math.log(16.0))))
    val l0 = levels.count(_ == 0).toDouble / levels.size
    assert(l0 > 0.85 && l0 < 0.99) // P(level 0) = 1 - 1/16 ≈ 0.9375
    assert(levels.max <= 16)
  }
}
