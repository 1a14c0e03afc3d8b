package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting operators for training-data pipelines:
  * stable under reruns, partitioning-independent, and engine-replicable
  * (the assignment is a pure function of the id, so a SQL oracle reproduces
  * it bit-for-bit — no RNG state anywhere).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from an id column: the first 8 hex chars
    * of md5(id as string), read as an integer. Overflow-free at any id range
    * (unlike multiplicative hashing on BIGINT, which overflows at web-scale
    * ids) and identical across engines.
    */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("bigint") % buckets

  /** Train/val/test assignment by hashed-id percentile: [0, train) → train,
    * [train, train+val) → val, rest → test (percentages of 100). Stable:
    * adding or removing OTHER rows never moves an id between splits — the
    * property reproducible-pipeline splits need (a row-number split
    * reshuffles everything on any upstream change).
    */
  def assignSplits(
      df: DataFrame, idCol: String,
      trainPct: Int = 80, valPct: Int = 10
  ): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"bad split percentages: $trainPct/$valPct")
    val b = hashBucket(col(idCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Per-stratum split sizes — the stratification audit a pipeline runs
    * after splitting (counts, not rows: the check is aggregate shape).
    */
  def splitCounts(df: DataFrame, idCol: String, stratumCol: String): DataFrame =
    assignSplits(df, idCol)
      .groupBy(col("split"), col(stratumCol))
      .agg(count(lit(1)).as("n"))

  /** Deterministic per-stratum downsampling: keep ~`fraction` of each
    * stratum by hashed-id threshold (the sampleBy shape without RNG — the
    * kept set is a stable function of the ids).
    */
  def sampleByStratum(
      df: DataFrame, idCol: String, fraction: Double, buckets: Int = 10000
  ): DataFrame =
    df.where(hashBucket(col(idCol), buckets) < (fraction * buckets).toLong)

  /** The raw 32-bit md5-prefix hash (the total order behind [[hashBucket]]). */
  private def hash32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("bigint")

  /** Token-budget selection: keep documents, in the deterministic
    * (hash(id), id) order, while the cumulative token count stays ≤
    * `budget` — the "take the first N tokens of a shuffled corpus" step of
    * a training-data pipeline, rerun-stable like the splits.
    *
    * Semantics are a GLOBAL ordered cumulative sum, but a global window
    * would single-partition the corpus at 100 TB. Instead: hash-range
    * buckets aggregate their token totals (one partial-agg pass,
    * metadata-sized result), the driver prefix-sums them to locate the
    * boundary bucket, full buckets below it pass through with a plain
    * filter, and only the ONE boundary bucket (1/`buckets` of the data)
    * runs an ordered window — identical output to the global window at any
    * scale.
    *
    * @param tokensCol per-doc token count column
    */
  def takeTokenBudget(
      df: DataFrame, idCol: String, tokensCol: String, budget: Long,
      bucketBits: Int = 8
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = 1 << bucketBits
    // RANGE buckets (top bits of the 32-bit hash): bucket order == global
    // hash order, the property the prefix-sum boundary needs
    val withHash = df.withColumn("__h", hash32(col(idCol)))
      .withColumn("__b", shiftright(col("__h"), 32 - bucketBits))
    // bucket totals: tiny aggregate (≤ `buckets` rows on the driver)
    val totals = withHash.groupBy(col("__b"))
      .agg(sum(col(tokensCol)).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cum = 0L
    var boundary = -1L
    var offset = 0L
    var bi = 0L
    while (bi < buckets && boundary < 0) {
      val t = totals.getOrElse(bi, 0L)
      if (cum + t > budget) { boundary = bi; offset = cum }
      else cum += t
      bi += 1
    }
    if (boundary < 0) df // everything fits
    else {
      val below = withHash.where(col("__b") < boundary)
      val w = Window.orderBy(col("__h"), col(idCol))
      val atBoundary = withHash.where(col("__b") === boundary)
        .withColumn("__cum", sum(col(tokensCol)).over(w) + offset)
        .where(col("__cum") <= budget)
        .drop("__cum")
      below.unionByName(atBoundary).drop("__h", "__b")
    }
  }
}
