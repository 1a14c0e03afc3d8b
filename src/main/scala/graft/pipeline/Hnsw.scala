package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HNSW approximate nearest-neighbor search, re-expressed for Spark the way
  * the reference shards it: one navigable small-world graph PER PARTITION
  * (the reference builds one per segment — `util/hnsw/HnswGraphBuilder.java`,
  * `codecs/lucene99/Lucene99HnswVectorsFormat.java` — and merges per-segment
  * top-k), searched fan-out with a broadcast query, then a global top-k
  * merge. Cost per query tracks ef·log(partitionSize) per partition, never
  * corpus size; partitions bound graph memory exactly like segments do.
  *
  * Determinism (required by the correctness gate): insertion order is
  * sorted-by-id within a partition, the level assignment is a splitmix64
  * hash of the id (not a Random), all candidate orderings tie-break by id.
  *
  * Connectivity guarantee: every insert records its nearest existing node
  * as a SPANNING-TREE edge, and tree edges are exempt from Mmax pruning in
  * both directions, so layer 0 stays connected by construction (the
  * reference patches connectivity after pruning in
  * `HnswGraphBuilder.connectComponents`; the tree-edge exemption is the
  * closed-form version). With `efSearch >= partition size` the layer-0
  * traversal therefore visits every node — the exact mode `ann_hnsw_exact`
  * pins against the brute-force SQL oracle.
  */
object Hnsw {

  private final val MaxLevel = 16

  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic geometric level: floor(-ln(u) · mL), u ∈ (0,1] from the
    * id hash (ref `HnswGraphBuilder.getRandomGraphLevel`).
    */
  private[pipeline] def levelOf(id: Long, seed: Long, mL: Double): Int = {
    val u = ((splitmix64(seed ^ id) >>> 11) + 1).toDouble * 1.1102230246251565e-16
    math.min(MaxLevel, (-math.log(u) * mL).toInt)
  }

  private[graft] def levelOfForTest(id: Long, seed: Long, mL: Double): Int =
    levelOf(id, seed, mL)

  /** One partition's graph. Vectors are L2-normalized once; "distance" is
    * 1 − dot (cosine distance).
    */
  private final class Graph(m: Int, efC: Int, seed: Long) {
    val ids = mutable.ArrayBuffer[Long]()
    val vecs = mutable.ArrayBuffer[Array[Double]]()
    val levels = mutable.ArrayBuffer[Int]()
    // links(node)(level) — pruned adjacency
    val links = mutable.ArrayBuffer[Array[mutable.ArrayBuffer[Int]]]()
    // unprunable spanning edges (both directions), level 0 only
    val tree = mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]()
    var entry: Int = -1
    private val mL = 1.0 / math.log(m.toDouble)

    private def dist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      1.0 - s
    }

    /** Best-first layer search (ref `HnswGraphSearcher.searchLevel`):
      * bounded result set of `ef`, tie-break by id for determinism.
      */
    private def searchLayer(q: Array[Double], eps: Seq[Int], lev: Int, ef: Int)
    : mutable.ArrayBuffer[(Double, Int)] = {
      implicit val ord: Ordering[(Double, Int)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
      val visited = mutable.HashSet[Int]()
      val cand = mutable.PriorityQueue[(Double, Int)]()(ord.reverse) // min-heap
      val res = mutable.PriorityQueue[(Double, Int)]()(ord)          // max-heap
      for (ep <- eps.distinct) {
        val d = dist(q, vecs(ep))
        visited += ep; cand.enqueue((d, ep)); res.enqueue((d, ep))
      }
      while (res.size > ef) res.dequeue()
      while (cand.nonEmpty) {
        val (dc, c) = cand.dequeue()
        if (res.size >= ef && dc > res.head._1) { cand.clear() }
        else {
          val nbrs =
            if (lev == 0) links(c)(0).iterator ++ tree(c).iterator
            else links(c)(lev).iterator
          for (nb <- nbrs; if !visited.contains(nb)) {
            visited += nb
            val d = dist(q, vecs(nb))
            if (res.size < ef || d < res.head._1 ||
                (d == res.head._1 && ids(nb) < ids(res.head._2))) {
              cand.enqueue((d, nb)); res.enqueue((d, nb))
              if (res.size > ef) res.dequeue()
            }
          }
        }
      }
      val out = mutable.ArrayBuffer[(Double, Int)]()
      while (res.nonEmpty) out += res.dequeue()
      out.sortInPlaceBy { case (d, n) => (d, ids(n)) }
      out
    }

    private def trim(node: Int, lev: Int): Unit = {
      val cap = if (lev == 0) 2 * m else m
      val l = links(node)(lev)
      if (l.length > cap) {
        val kept = l.map(n => (dist(vecs(node), vecs(n)), ids(n), n))
          .sortBy(t => (t._1, t._2)).take(cap).map(_._3)
        links(node)(lev) = mutable.ArrayBuffer(kept.toSeq: _*)
      }
    }

    def insert(id: Long, vec: Array[Double]): Unit = {
      val node = ids.length
      val lv = levelOf(id, seed, mL)
      ids += id; vecs += vec; levels += lv
      links += Array.fill(lv + 1)(mutable.ArrayBuffer[Int]())
      tree += mutable.ArrayBuffer[Int]()
      if (entry < 0) { entry = node; return }
      var ep = entry
      val topL = levels(entry)
      var lev = topL
      while (lev > lv) { // greedy descent above the node's level
        ep = searchLayer(vec, Seq(ep), lev, 1).head._2
        lev -= 1
      }
      var nearest0 = -1
      while (lev >= 0) {
        val w = searchLayer(vec, Seq(ep), lev, efC)
        val sel = w.take(m)
        for ((_, nb) <- sel) {
          links(node)(lev) += nb
          links(nb)(lev) += node
          trim(nb, lev)
        }
        ep = w.head._2
        if (lev == 0) nearest0 = w.head._2
        lev -= 1
      }
      trim(node, 0)
      // spanning edge to the level-0 nearest existing node: never pruned,
      // kept in both directions — layer 0 stays one component
      if (nearest0 >= 0) { tree(node) += nearest0; tree(nearest0) += node }
      if (lv > topL) entry = node
    }

    /** All ef candidates (id, cosine), best first — the caller does the
      * global rounded-similarity merge, so no local cut can disagree with
      * the global (rounded sim desc, id asc) total order at a tie.
      */
    def search(q: Array[Double], k: Int, efSearch: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Seq.empty
      var ep = entry
      var lev = levels(entry)
      while (lev > 0) { ep = searchLayer(q, Seq(ep), lev, 1).head._2; lev -= 1 }
      val ef = math.max(k, math.min(efSearch, ids.length))
      searchLayer(q, Seq(ep), 0, ef)
        .map { case (d, n) => (ids(n), 1.0 - d) }.toSeq
    }
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
    v.map(_ * inv)
  }

  /** Distributed top-k: per-partition graph build + fan-out search + global
    * `TakeOrderedAndProject` merge. `efSearch = Int.MaxValue` clamps to the
    * partition size = exhaustive traversal of the (connected) layer 0 —
    * exact by construction.
    */
  def topK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int,
      m: Int = 16, efC: Int = 100, efSearch: Int = 100,
      seed: Long = 42L, excludeId: Option[Long] = None
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qn = normalize(query.map(_.toDouble))
    val rows = df
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val local = rows.mapPartitions { it =>
      val items = it.toArray.sortBy(_._1)
      if (items.isEmpty) Iterator.empty
      else {
        val g = new Graph(m, efC, seed)
        items.foreach { case (id, v) => g.insert(id, normalize(v)) }
        val kk = excludeId.fold(k)(_ => k + 1)
        g.search(qn, kk, efSearch)
          .filterNot { case (id, _) => excludeId.contains(id) }
          .iterator
      }
    }.toDF("id", "sim")
    local
      .select(col("id"), round(col("sim"), 4).as("sim"))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }

  /** Batch kNN join — the training-pipeline shape (retrieve neighbors for
    * MANY query vectors: dedup candidates, retrieval pairs): the query
    * batch broadcasts, each partition builds its graph ONCE and answers
    * every query from it, and a per-query window top-k merges globally.
    * Graph-build cost amortizes over the whole batch (vs [[topK]], which
    * pays it per call); the reference's analog is one `HnswGraphSearcher`
    * reused across queries on a fixed per-segment graph.
    *
    * Returns (qid, id, sim) rows, k per qid. `efSearch = Int.MaxValue`
    * clamps to partition size = exact (same connectivity argument as
    * [[topK]]) — the oracle-gated mode.
    */
  def knnJoin(
      df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, m: Int = 16, efC: Int = 100, efSearch: Int = 100,
      seed: Long = 42L, excludeSelf: Boolean = false
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col(qidCol).cast("long"), col(qvecCol).cast("array<double>"))
      .as[(Long, Array[Double])].collect()
      .map { case (qid, v) => (qid, normalize(v)) }
    require(qs.length <= 100000, s"query batch ${qs.length} too large to broadcast")
    val qb = spark.sparkContext.broadcast(qs)
    val rows = df
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    val kk = if (excludeSelf) k + 1 else k
    val local = rows.mapPartitions { it =>
      val items = it.toArray.sortBy(_._1)
      if (items.isEmpty) Iterator.empty
      else {
        val g = new Graph(m, efC, seed)
        items.foreach { case (id, v) => g.insert(id, normalize(v)) }
        qb.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, kk, efSearch).iterator
            .filterNot { case (id, _) => excludeSelf && id == qid }
            .map { case (id, sim) => (qid, id, sim) }
        }
      }
    }.toDF("qid", "id", "sim")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"sim".desc, $"id".asc)
    local
      .select($"qid", $"id", round($"sim", 4).as("sim"))
      .withColumn("__r", row_number().over(w))
      .where($"__r" <= k).drop("__r")
  }

  /** One-row (found, total, recall) of [[topK]] against the exact
    * brute-force top-k, with an in-entry floor assertion.
    */
  def recall(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int,
      m: Int = 16, efC: Int = 100, efSearch: Int = 100,
      seed: Long = 42L, excludeId: Option[Long] = None,
      recallFloor: Double = 0.0
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val approx = topK(df, idCol, vecCol, query, k, m, efC, efSearch, seed, excludeId)
      .select(col("id")).as[Long].collect().toSet
    val exact = Similarity.bruteForceTopK(df, idCol, vecCol, query, k, excludeId)
      .select(col(idCol).cast("long")).as[Long].collect().toSet
    val found = (approx & exact).size
    val rec = found.toDouble / exact.size
    require(rec >= recallFloor, f"hnsw recall $rec%.3f < floor $recallFloor%.3f")
    Seq((found, exact.size, rec)).toDF("found", "total", "recall")
  }
}
