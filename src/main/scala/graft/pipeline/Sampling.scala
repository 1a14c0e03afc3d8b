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

  /** Deterministic per-key rate capping — the head-domain downsampling
    * stage of a web-corpus pipeline: groups with ≤ `cap` rows pass
    * untouched; larger groups keep each row with probability `cap/n` via
    * the hashed-id residue, i.e. ~`cap` expected survivors, rerun-stable
    * and independent of partitioning. Execution: ONE metadata-shaped count
    * aggregation + one equi-join (AQE broadcasts it while the key
    * cardinality is small) + a pure-function filter — no windows, no
    * per-group ranking task, so a 10⁹-page head domain costs the same as
    * any other (the exact-top-cap alternative would single-task sort it).
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, cap: Long): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    df.join(counts, Seq(keyCol))
      .where(col("__n") <= cap || hash32(col(idCol)) % col("__n") < cap)
      .drop("__n")
  }

  /** Token-budget selection: keep documents, in the deterministic
    * (hash(id), id) order, while the cumulative token count stays ≤
    * `budget` — the "take the first N tokens of a shuffled corpus" step of
    * a training-data pipeline, rerun-stable like the splits.
    *
    * Semantics are a GLOBAL ordered cumulative sum, but a global window
    * would single-partition the corpus at 100 TB. Instead: hash-range
    * buckets (successive `bucketBits`-wide slices of the 32-bit hash, so
    * bucket order == global hash order) aggregate their token totals — a
    * metadata-sized result the driver prefix-sums to locate the boundary
    * bucket. Full buckets below the boundary pass through with a plain
    * filter; the ONE boundary bucket RECURSES on the next hash slice until
    * it holds ≤ `windowRowsMax` rows, and only that bounded remainder runs
    * an ordered window. The single-task step is therefore O(windowRowsMax),
    * a constant — never corpus/2^bucketBits — at ≤ ⌈32/bucketBits⌉
    * metadata-sized aggregate jobs. Output identical to the global window
    * at any scale (spec-checked through multiple recursion levels).
    *
    * @param tokensCol     per-doc token count column
    * @param windowRowsMax recursion cutoff: the boundary remainder may hold
    *                      at most this many rows before the final window
    */
  def takeTokenBudget(
      df: DataFrame, idCol: String, tokensCol: String, budget: Long,
      bucketBits: Int = 8, windowRowsMax: Long = 1L << 16
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketBits >= 1 && bucketBits <= 16, s"bad bucketBits $bucketBits")
    val withHash = df.withColumn("__h", hash32(col(idCol)))

    /** Kept subset of `cand` (one hash-prefix range, higher bits all equal),
      * `offset` = tokens consumed globally before this range, `shift` = low
      * hash bits not yet fixed by the prefix.
      */
    def recurse(cand: DataFrame, offset: Long, shift: Int): DataFrame = {
      val useBits = math.min(bucketBits, shift)
      val sh = shift - useBits
      val b = shiftright(col("__h"), sh).bitwiseAND(lit((1L << useBits) - 1))
      // bucket totals + row counts: tiny aggregate (≤ 2^bucketBits rows)
      // NULL token counts contribute 0 to the stream (window sums skip
      // NULLs) — coalesce so an all-NULL bucket doesn't NULL the total
      val totals = cand.groupBy(b.as("__b"))
        .agg(coalesce(sum(col(tokensCol)), lit(0L)).as("t"), count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      var cum = offset
      var boundary = -1L
      var bOffset = 0L
      var bRows = 0L
      var i = 0
      while (i < totals.length && boundary < 0) {
        val (bi, t, c) = totals(i)
        if (cum + t > budget) { boundary = bi; bOffset = cum; bRows = c }
        else cum += t
        i += 1
      }
      if (boundary < 0) cand // the whole range fits
      else {
        val below = cand.where(b < boundary)
        val bnd = cand.where(b === boundary)
        val inner =
          if (sh > 0 && bRows > windowRowsMax) recurse(bnd, bOffset, sh)
          else {
            // bounded remainder: ≤ windowRowsMax rows (or the hash is fully
            // consumed — ties broken by id). partitionBy a constant-valued
            // non-foldable key (h % 1 ≡ 0; a literal would be optimized
            // away) so the deliberate single-group window doesn't trip
            // Spark's unpartitioned-window warning: the group IS bounded.
            val w = Window.partitionBy(pmod(col("__h"), lit(1L)))
              .orderBy(col("__h"), col(idCol))
              // explicit ROWS frame: Spark's default for an ordered window
              // is RANGE (peers — ties in (__h, id) — share the frame),
              // which diverges from the oracle's pinned ROWS cumsum the
              // moment ids duplicate
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            bnd.withColumn("__cum", sum(col(tokensCol)).over(w) + bOffset)
              .where(col("__cum") <= budget)
              .drop("__cum")
          }
        below.unionByName(inner)
      }
    }

    recurse(withHash, 0L, 32).drop("__h")
  }

  /** Sequence packing (concat-and-chunk): documents are concatenated in the
    * deterministic (hash(id), id) shuffle order and the token stream is cut
    * into fixed `seqLen` training windows — the standard pretraining
    * packing step. Each document gets its global token `start_off` and the
    * window range it lands in (`bin_first`..`bin_last`; documents longer
    * than the remaining window space span bins, as concat-and-chunk
    * prescribes).
    *
    * Semantics are a GLOBAL ordered cumulative sum; the execution is not:
    * the top `bucketBits` of the 32-bit id hash slice the corpus into
    * hash-range buckets (bucket order == global order), one metadata-sized
    * aggregate computes per-bucket token totals, the driver prefix-sums
    * them into bucket offsets (≤ 2^bucketBits rows), and a per-bucket
    * window adds the local cumsum — so the largest single-task sort is
    * corpus/2^bucketBits, never the corpus. Two shuffles total (the
    * aggregate + the bucket-partitioned window).
    *
    * Output is a pure function of (id, tokens) pairs — rerun-stable,
    * partitioning-independent, SQL-oracle-replicable.
    */
  def packSequences(
      df: DataFrame, idCol: String, tokensCol: String, seqLen: Long,
      bucketBits: Int = 16
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqLen > 0, s"bad seqLen $seqLen")
    require(bucketBits >= 1 && bucketBits <= 20, s"bad bucketBits $bucketBits")
    val spark = df.sparkSession
    import spark.implicits._
    val bucketed = df
      .withColumn("__h", hash32(col(idCol)))
      .withColumn("__b", shiftright(col("__h"), 32 - bucketBits))
    // per-bucket token totals: ≤ 2^bucketBits rows — driver prefix-sum
    // coalesce: an all-NULL-ntok bucket totals 0, not NULL (window sums
    // skip NULLs, so NULL rows occupy no stream space)
    val totals = bucketed.groupBy(col("__b"))
      .agg(coalesce(sum(col(tokensCol)), lit(0L)).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var cum = 0L
    val offsets = totals.map { case (b, t) => val o = (b, cum); cum += t; o }
    val offsetsDf = broadcast(offsets.toSeq.toDF("__b", "__off"))
    // explicit ROWS frame (Spark's ordered-window default is RANGE: ties in
    // (__h, id) would share one frame, diverging from a per-row cumsum on
    // any duplicate id)
    val w = Window.partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(offsetsDf, "__b")
      .withColumn("__end", sum(col(tokensCol)).over(w) + col("__off"))
      .withColumn("start_off", col("__end") - col(tokensCol))
      .select(col(idCol), col(tokensCol), col("start_off"),
        // integer division (not floor-of-double): exact at any offset.
        // bin_last derives from start_off + ntok (NOT __end): with a NULL
        // token count, start_off/bin_first/bin_last must all be NULL —
        // __end stays non-NULL (sum skips NULLs), so dividing it would
        // manufacture a value where the per-row algebra has none
        expr(s"start_off div $seqLen").as("bin_first"),
        expr(s"(start_off + $tokensCol - 1) div $seqLen").as("bin_last"))
  }

  /** Deterministic data-mixture resampling: keep a hashed-id sample of each
    * listed source so the kept row counts approach the `targets`
    * proportions, capped by the scarcest source (the source whose full
    * volume divided by its weight is smallest passes through whole; every
    * other source downsamples to match). Rows from unlisted sources drop.
    *
    * The per-source keep fraction comes from ONE metadata-sized count
    * aggregate; the filter itself is the [[hashBucket]] threshold — a pure
    * function of the id, so the kept set is rerun-stable under any
    * partitioning and any upstream insertion order (the property a
    * reproducible mixture needs), and a SQL oracle reproduces it exactly.
    */
  def resampleMixture(
      df: DataFrame, idCol: String, sourceCol: String,
      targets: Map[String, Double], buckets: Int = 1000000
  ): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0), s"bad targets $targets")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.keys.foreach(s =>
      require(counts.getOrElse(s, 0L) > 0L, s"empty or missing source $s"))
    // weights are RELATIVE (no normalization — normalizing cancels
    // algebraically but perturbs the doubles an external SQL replica
    // computes); capacity = mixture size the scarcest source supports
    val capacity = targets.map { case (s, wt) => counts(s) / wt }.min
    val keepExpr = targets.foldLeft(lit(false)) { case (acc, (s, wt)) =>
      val frac = math.min(1.0, capacity * wt / counts(s))
      acc || (col(sourceCol) === s &&
        hashBucket(col(idCol), buckets) < math.round(frac * buckets))
    }
    df.where(keepExpr)
  }

  /** DSIR-style data selection via importance resampling (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): fit hashed-n-gram (unigram + bigram) bag models over a
    * TARGET slice and over the RAW pool, weight each raw document by the
    * log-likelihood ratio of its grams under the two models (add-`alpha`
    * smoothed), and keep the top `ceil(keepFrac * |raw|)` raw documents by
    * weight (ties broken by id — deterministic, no Gumbel noise, so a SQL
    * oracle reproduces the kept set exactly).
    *
    * 100 TB shape: the gram explode is narrow; the model is ONE partial-agg
    * shuffle collapsing to ≤ `buckets` rows (map-side combine bounds the
    * shuffle at buckets × partitions regardless of corpus size) and joins
    * back as a broadcast; the per-doc weight is one keyed agg; the cut is a
    * TakeOrderedAndProject (per-partition top-k + driver merge of k heads),
    * never a global sort materialization. Per-doc weights round to 4 dp
    * before the cut so cross-engine double-summation order can't flip a
    * rank (same guard as the xent/classify entries).
    */
  def dsirSelect(
      df: DataFrame, idCol: String, textCol: String, isTarget: Column,
      buckets: Int = 1024, keepFrac: Double = 0.25, alpha: Double = 1.0
  ): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"bad keepFrac $keepFrac")
    require(buckets > 0 && alpha > 0, s"bad buckets/alpha $buckets/$alpha")
    val ts = split(col(textCol), " ")
    // element_at is 1-based: bigram i joins tokens i-1 and i. sequence()
    // with start > stop counts DOWN in Spark, so short docs need the guard.
    val bigrams = when(size(ts) >= 2,
      transform(sequence(lit(2), size(ts)),
        i => concat(element_at(ts, i - 1), lit("_"), element_at(ts, i))))
      .otherwise(array().cast("array<string>"))
    val grams = df.select(col(idCol).as("id"), isTarget.as("__t"),
      explode(concat(ts, bigrams)).as("g"))
    val bucketed = grams.select(col("id"), col("__t"),
      hashBucket(col("g"), buckets).as("b"))
    val model = bucketed.groupBy(col("b")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).cast("double").as("tc"),
      sum(when(col("__t"), 0L).otherwise(1L)).cast("double").as("rc"))
    val totals = model.agg(sum(col("tc")).as("tt"), sum(col("rc")).as("tr"))
    // every gram of every doc contributed to `model`, so the weight join
    // below never misses a bucket — no densify pass needed
    val lr = model.crossJoin(broadcast(totals)).select(col("b"),
      (log((col("tc") + alpha) / (col("tt") + alpha * buckets)) -
        log((col("rc") + alpha) / (col("tr") + alpha * buckets))).as("lr"))
    val raw = bucketed.where(!col("__t"))
    val weights = raw.join(broadcast(lr), "b")
      .groupBy(col("id")).agg(round(sum(col("lr")), 4).as("logw"))
    val nRaw = df.where(!isTarget).count()
    val k = math.ceil(keepFrac * nRaw).toInt
    weights.orderBy(col("logw").desc, col("id").asc).limit(k)
      .select(col("id").as(idCol), col("logw"))
  }
}
