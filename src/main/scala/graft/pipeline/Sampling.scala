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
}
