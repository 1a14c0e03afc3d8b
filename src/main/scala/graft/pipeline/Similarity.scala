package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and a
  * sign-random-projection LSH-bucketed variant as the 100 TB scale path
  * (candidates only from matching hash buckets → cost tracks bucket density,
  * not corpus size).
  *
  * Dot products/norms are `aggregate`/`zip_with` column expressions (codegen,
  * no UDFs).
  */
object Similarity {

  /** Cosine similarity of two double-array columns. Dot products run
    * through the codegen'd [[graft.functions.VecDot]] native expression
    * (left-fold order, bit-identical to the interpreted
    * `aggregate`/`zip_with` form it replaces — spec-asserted — but inside
    * whole-stage codegen instead of per-element lambda interpretation).
    */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VecExpressions.vecDot
    val dot = vecDot(a, b)
    val na = sqrt(vecDot(a, a))
    val nb = sqrt(vecDot(b, b))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Exact top-k cosine neighbors of one query vector: a narrow scan + a
    * global `ORDER BY sim DESC LIMIT k` (Catalyst `TakeOrderedAndProject` —
    * per-partition heaps, no full sort).
    */
  def bruteForceTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int, excludeId: Option[Long] = None
  ): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val base = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol), round(cosine(asDouble(col(vecCol)), q), 4).as("sim"))
    val filtered = excludeId.map(e => base.where(col(idCol) =!= e)).getOrElse(base)
    filtered.orderBy(col("sim").desc, col(idCol).asc).limit(k)
  }

  /** Exact top-k neighbors for *every* row (all-pairs, window'd) — the
    * validation path for the LSH variant; O(n^2), small inputs only.
    */
  def allPairsTopK(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val a = v.as("a"); val b = v.as("b")
    val pairs = a.join(b, col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nbr"),
        round(cosine(col("a.v"), col("b.v")), 4).as("sim"))
    val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("nbr").asc)
    pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p derived
    * from splitmix64(seed, p, j), mapped to [-1, 1).
    */
  private[graft] def planeComponent(seed: Long, p: Int, j: Int): Double = {
    var z = seed + (p.toLong << 32) + j.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11) * 1.1102230246251565e-16 * 2.0 - 1.0
  }

  /** Sign-random-projection bucket id: `nPlanes` sign bits packed into a
    * long. Vectors in the same bucket are cosine-close with high probability.
    */
  def srpBucket(vec: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    val bits = (0 until nPlanes).map { p =>
      val plane = array((0 until dim).map(j => lit(planeComponent(seed, p, j))): _*)
      val dot = graft.functions.VecExpressions.vecDot(vec, plane)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** One-row (found, total, recall): exact top-k neighbor pairs recovered
    * by [[lshTopK]] verbatim (its SRP hyperplanes are deterministic
    * splitmix64 components the oracle inlines as literals, so the whole
    * pipeline is independently computable in SQL). Truth = [[allPairsTopK]]
    * (small-input validation baseline).
    */
  def lshRecall(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nPlanes: Int = 8, tables: Int = 4, seed: Long = 42L,
      recallFloor: Double = 0.0
  ): DataFrame = {
    val approx = lshTopK(df, idCol, vecCol, dim, k, nPlanes, tables, seed)
      .select(col("id").as("id_a"), col("nbr").as("id_b"))
    val truth = allPairsTopK(df, idCol, vecCol, k)
      .select(col("id").as("id_a"), col("nbr").as("id_b"))
    Dedup.recallRow(df, truth, approx, recallFloor)
  }

  /** LSH ANN: bucket every vector with `tables` independent SRP hashes;
    * candidates = same (table, bucket); exact cosine re-rank within
    * candidates; top-k per query id. Shuffles on (table, bucket) — bounded
    * by bucket occupancy, never all-pairs.
    */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, nPlanes: Int = 8, tables: Int = 4, seed: Long = 42L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // repartition the input: a single-file source would otherwise compute
    // all SRP projections on one task
    val v = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    // candidate pairs travel as bare ids through the bucket join; the
    // dim-sized vectors only re-attach after pair dedup
    val bucketed = v.select(col("id"),
      posexplode(array((0 until tables).map(t =>
        srpBucket(col("v"), dim, nPlanes, seed + t * 7919L)): _*)).as(Seq("table", "bucket")))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    val cands = a.join(b,
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id"), col("b.id").as("nbr"))
      .dropDuplicates("id", "nbr")
    val scored = cands
      .join(v.select(col("id"), col("v").as("va")), "id")
      .join(v.select(col("id").as("nbr"), col("v").as("vb")), "nbr")
      .select(col("id"), col("nbr"), round(cosine(col("va"), col("vb")), 4).as("sim"))
    val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("nbr").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009) — the
    * standard hybrid-search combiner for a lexical BM25 leg and a vector
    * leg: each leg contributes 1/(kConst + rank) per document, summed.
    * Inputs carry (id, 1-based rank) and are top-N bounded by construction
    * (each leg is already a top-N), so the union, the keyed agg, and the
    * final cut all operate on ≤ Σ N rows — nothing here scales with the
    * corpus. Rank positions (not scores) fuse, so the legs' incomparable
    * score scales never meet; the fused score rounds to 6 dp (a sum of at
    * most `legs.size` exact reciprocals — commutative, engine-portable).
    */
  def rrfFuse(
      legs: Seq[DataFrame], idCol: String, rankCol: String,
      kConst: Int = 60, k: Int = 10
  ): DataFrame = {
    require(legs.nonEmpty && kConst > 0 && k > 0,
      s"bad rrf params: ${legs.size} legs, kConst=$kConst, k=$k")
    val contrib = legs
      .map(_.select(col(idCol),
        (lit(1.0) / (lit(kConst.toDouble) + col(rankCol))).as("__c")))
      .reduce(_ unionByName _)
    contrib.groupBy(col(idCol))
      .agg(round(sum(col("__c")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol).asc).limit(k)
  }
}
