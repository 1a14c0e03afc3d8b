package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF (inverted-file) ANN index over an embedding column — the
  * scale path for repeated similarity queries (the reference ships HNSW per
  * field, `/root/reference/lucene/core/src/java/org/apache/lucene/codecs/lucene99/Lucene99HnswVectorsFormat.java`;
  * a graph walk is pointer-chasing and Spark-hostile, so the distributed
  * re-expression is IVF: coarse quantization into `nCenters` cells, vectors
  * stored sorted by cell for row-group pruning, queries probe the `nprobe`
  * nearest cells and re-rank exactly).
  *
  *  - build: deterministic seeded centroid init (smallest xxhash64 ids) +
  *    `lloydIters` Lloyd refinement passes, assignment = one narrow pass,
  *    layout = repartition + sortWithinPartitions on `cell` (Parquet min/max
  *    prunes non-probed cells).
  *  - query: centroids load driver-side (nCenters × dim — tiny), the scan
  *    reads only probed cells, exact cosine re-rank inside
  *    (`TakeOrderedAndProject` top-k). `nprobe = nCenters` degenerates to
  *    exact brute force (spec-asserted).
  */
object AnnIndex {

  private def l2normalize(c: org.apache.spark.sql.Column) = {
    val n = sqrt(aggregate(transform(c, x => x * x), lit(0.0d), (a, x) => a + x))
    transform(c, x => x / n)
  }

  /** Build and commit the index at `outDir` (idempotent: skipped when the
    * meta file exists). Tables: `vectors/` (id, cell, v) sorted by cell;
    * `centroids/` (cell, c).
    */
  def build(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      outDir: String, nCenters: Int = 16, lloydIters: Int = 2, seed: Long = 42L
  ): Unit = {
    val spark = df.sparkSession
    val metaPath = java.nio.file.Paths.get(outDir, "ann_meta.json")
    if (java.nio.file.Files.exists(metaPath)) return
    val par = spark.sparkContext.defaultParallelism
    val v = df.repartition(par)
      .select(col(idCol).cast("long").as("id"),
        l2normalize(transform(col(vecCol), x => x.cast("double"))).as("v"))
      .cache()

    // deterministic init: the nCenters vectors with smallest seeded id hash
    var centroids: Array[(Int, Array[Double])] = v
      .select(col("id"), col("v"), xxhash64(col("id"), lit(seed)).as("h"))
      .orderBy(col("h")).limit(nCenters)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray).zipWithIndex.map(_.swap)

    def nearestCell(centro: Array[(Int, Array[Double])]) = {
      // centroid matrix folds into the plan as literals (nCenters×dim doubles)
      val cells = centro.map { case (cid, cv) =>
        val cArr = array(cv.map(lit): _*)
        struct(lit(cid).as("cell"),
          graft.functions.VecExpressions.vecDot(col("v"), cArr).as("dot"))
      }
      element_at(array_sort(array(cells: _*),
        (a, b) => when(a("dot") > b("dot"), -1).when(a("dot") < b("dot"), 1)
          .otherwise(a("cell").cast("int") - b("cell").cast("int"))), 1)("cell")
    }

    // Lloyd refinement: assign, then per-cell dimension means (posexplode +
    // groupBy(cell, dim) — two narrow shuffles per iteration)
    for (_ <- 0 until lloydIters) {
      val assigned = v.withColumn("cell", nearestCell(centroids))
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(expr("transform(array_sort(collect_list(struct(d, m))), s -> s.m)").as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
        .toMap
      centroids = centroids.map { case (cid, old) =>
        cid -> means.get(cid).map { m =>
          val n = math.sqrt(m.map(x => x * x).sum)
          if (n == 0) old else m.map(_ / n)
        }.getOrElse(old)
      }
    }

    v.withColumn("cell", nearestCell(centroids))
      .repartition(math.min(par, nCenters), col("cell"))
      .sortWithinPartitions(col("cell"), col("id"))
      .write.mode("overwrite").parquet(s"$outDir/vectors")
    import spark.implicits._
    centroids.toSeq.map { case (cid, c) => (cid, c.toSeq) }
      .toDF("cell", "c")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/centroids")
    v.unpersist()
    java.nio.file.Files.write(metaPath,
      s"""{"nCenters":$nCenters,"dim":$dim,"seed":$seed}""".getBytes)
    ()
  }

  /** Top-k cosine neighbors of `query` probing the `nprobe` nearest cells.
    * The vectors scan carries a `cell IN (...)` pushdown — only probed
    * cells' row groups are read.
    */
  def topK(
      spark: SparkSession, indexDir: String, query: Array[Float],
      k: Int, nprobe: Int, excludeId: Option[Long] = None
  ): DataFrame = {
    val qn = {
      val q = query.map(_.toDouble)
      val n = math.sqrt(q.map(x => x * x).sum)
      q.map(_ / n)
    }
    val cents = spark.read.parquet(s"$indexDir/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    val probes = cents
      .map { case (cid, c) => (cid, c.zip(qn).map { case (a, b) => a * b }.sum) }
      .sortBy { case (cid, dot) => (-dot, cid) }
      .take(nprobe).map(_._1).toSeq
    val qArr = array(qn.map(lit): _*)
    spark.read.parquet(s"$indexDir/vectors")
      .where(col("cell").isin(probes: _*))
      .select(col("id"),
        round(graft.functions.VecExpressions.vecDot(col("v"), qArr), 4).as("sim"))
      .where(excludeId.map(e => col("id") =!= e).getOrElse(lit(true)))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(k)
  }
}
