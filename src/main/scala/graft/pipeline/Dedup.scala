package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. Four families:
  *
  *  - exact (hash-groupBy): one shuffle on the fingerprint
  *  - n-gram Jaccard (exact pairwise over shared shingles): shuffle on
  *    shingle, then on pair — exact but O(candidate pairs); used to validate
  *    the approximate families
  *  - MinHash + LSH banding: the 100 TB path — candidate pairs only for docs
  *    sharing an LSH band bucket, so cost tracks true near-dup density
  *  - SimHash: 64-bit signature, hamming-adjacent buckets
  *
  * All deterministic (seeded hash mixing, no Math.random), all pure
  * DataFrame ops.
  */
object Dedup {

  /** Exact duplicate groups: (fingerprint, canonical id, group size) for
    * groups larger than 1. Equal texts collide on md5; group-by is one
    * shuffle with partial agg.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("group_size"))
      .where(col("group_size") > 1)

  /** Line-level dedup (the CCNet boilerplate-removal stage): drop the
    * "lines" that repeat across more than `maxDocFreq` documents — nav
    * bars, subscribe banners, copyright footers — and keep each document's
    * remaining lines in order. This corpus stores text as one
    * space-separated token stream, so a "line" is a fixed `lineLen`-token
    * window; a real crawl splits on '\n' in the same slot (the rest of the
    * pipeline is line-source-agnostic).
    *
    * Returns (id, kept_lines, dropped_lines, new_md5) — the audit row plus
    * the fingerprint of the reassembled text. Three shuffles, all keyed to
    * stay balanced at any corpus size: explode is shuffle-free, line
    * doc-frequencies aggregate on the line hash (partial agg first), the
    * verdict joins back on the same key, and the reassembly groups by doc.
    * Nothing is collected or broadcast — the line table is corpus-sized by
    * design.
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String,
                lineLen: Int = 12, maxDocFreq: Long = 50): DataFrame = {
    val toks = split(col(textCol), " ")
    val lines = df.select(
        col(idCol),
        posexplode(transform(
          sequence(lit(0), floor((size(toks) - 1) / lineLen).cast("int")),
          i => array_join(slice(toks, i * lineLen + 1, lit(lineLen)), " "))))
      .withColumnRenamed("pos", "li").withColumnRenamed("col", "line")
    val docFreq = lines
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("line_df"))
    lines.join(docFreq, "line")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("line_df") <= maxDocFreq, 1L).otherwise(0L))
          .as("kept_lines"),
        sum(when(col("line_df") > maxDocFreq, 1L).otherwise(0L))
          .as("dropped_lines"),
        md5(array_join(transform(
          sort_array(collect_list(when(col("line_df") <= maxDocFreq,
            struct(col("li"), col("line"))))),
          s => s.getField("line")), " ")).as("new_md5"))
  }

  /** Exact duplicated-substring removal (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022): every token
    * covered by a `w`-token window whose exact text occurs at least
    * `minOcc` times corpus-wide (all occurrences counted — within-doc
    * repeats included) is dropped; the residue keeps its original order.
    * Documented divergence from the paper's suffix-array tool: the paper
    * keeps one copy of each duplicated substring, this drops ALL
    * occurrences — the conservative variant, and the one expressible
    * without a global suffix array.
    *
    * Returns one audit row per document: (id, n_tokens, dup_tokens,
    * clean_fp) with clean_fp = md5 of the space-joined kept tokens
    * (md5("") when everything was duplicated).
    *
    * 100 TB shape: window occurrences are (key, doc, start) rows that
    * live in shuffles, never on the driver. Four balanced shuffles:
    * window-key occurrence counts (partial agg first), the verdict join
    * back on the same key (AQE skew-join splits Zipf-head boilerplate
    * windows), per-doc covered positions (collect_set bounded by doc
    * length), and the re-join to the token arrays. The window key is the
    * 64-bit md5 hex prefix — fixed-width in the shuffles and replicable
    * verbatim in SQL (`substr(md5(win), 1, 16)`), so an oracle reproduces
    * the full pipeline, collisions included; a key collision can only
    * over-mark (conservative) and is ~absent below 2^32 windows per
    * corpus-unique text.
    */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
                     w: Int = 5, minOcc: Long = 2,
                     keepFirst: Boolean = false): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val toks = df.repartition(par)
      .select(col(idCol).as("id"), split(col(textCol), " ").as("toks"))
    val nSh = size(col("toks")) - (w - 1)
    // window text from w O(1) element_at reads (see [[shingles]] on why
    // not slice); 1-based starts to match SQL generate_subscripts
    val winKey = (i: Column) => substring(
      md5(concat_ws(" ", (0 until w).map(o => element_at(col("toks"), i + lit(o))): _*)),
      1, 16)
    val wins = toks.select(col("id"),
        when(nSh >= 1,
          transform(sequence(lit(1), nSh), i =>
            struct(i.as("s"), winKey(i).as("k"))))
          .otherwise(array().cast("array<struct<s:int,k:string>>")).as("ws"))
      .select(col("id"), explode(col("ws")).as("win"))
      .select(col("id"), col("win.s").as("s"), col("win.k").as("k"))
    // keepFirst (the paper's own policy — Lee et al. keep ONE occurrence,
    // so corpus statistics survive dedup): the (min id, min start)
    // occurrence of each duplicated key stays uncovered; the min rides the
    // SAME aggregate as the occurrence count — no extra shuffle vs the
    // conservative drop-all default.
    val dupKeys = wins.groupBy(col("k"))
      .agg(count(lit(1)).as("occ"),
        min(struct(col("id"), col("s"))).as("keep"))
      .where(col("occ") >= minOcc)
      .select(col("k"), col("keep"))
    val dupOcc = wins.join(dupKeys, "k")
    val marked =
      if (keepFirst)
        dupOcc.where(!(col("id") === col("keep.id") && col("s") === col("keep.s")))
      else dupOcc
    val covered = marked
      .select(col("id"), explode(sequence(col("s"), col("s") + (w - 1))).as("p"))
      .groupBy(col("id"))
      .agg(sort_array(collect_set(col("p"))).as("cov"))
    toks.join(covered, Seq("id"), "left")
      .select(col("id"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("bigint").as("dup_tokens"),
        md5(array_join(
          when(col("cov").isNull, col("toks"))
            .otherwise(filter(col("toks"), (t, i) =>
              !array_contains(col("cov"), i + lit(1)))),
          " ")).as("clean_fp"))
  }

  /** Word w-shingles of a doc as a distinct array column. Each shingle is
    * assembled from `w` O(1) `element_at` reads (a per-position `slice`
    * would re-copy the token array for every offset — measured 10x slower
    * in the interpreted higher-order-function path).
    */
  def shingles(text: Column, w: Int): Column = {
    val toks = split(text, " ")
    val nSh = size(toks) - (w - 1)
    // sequence(1, n) descends when n < 1 — short docs get an empty array
    when(nSh >= 1,
      array_distinct(
        transform(sequence(lit(1), nSh), i =>
          concat_ws(" ", (0 until w).map(o => element_at(toks, i + lit(o))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact n-gram Jaccard near-dup pairs (a < b, jaccard >= threshold):
    * count-based intersection — shared-shingle equi-join with a length
    * filter (`t ≤ na/nb ≤ 1/t` is necessary for J ≥ t) folded into the join,
    * then one partial-agg count per (a, b) pair. All narrow rows, one wide
    * shuffle; the fastest exact strategy when shingle frequencies are
    * moderate. For corpora with Zipf-head shingles (df² products explode)
    * use [[jaccardPairsPrefix]], which prunes candidates by PPJoin prefix
    * filtering before any per-pair work.
    */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, threshold: Double = 0.5
  ): DataFrame = {
    val t = threshold - 1e-4 // admit borderline pairs that round up to t
    val par = df.sparkSession.sparkContext.defaultParallelism
    // repartition the INPUT: a single-file source would otherwise compute
    // shingles AND the whole broadcast-join product on ONE task
    val sh = df.repartition(par)
      .select(col(idCol).as("id"), shingles(col(textCol), w).as("sh"))
      .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    val a = sh.as("a"); val b = sh.as("b")
    a.join(b, col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
        col("b.n") >= col("a.n") * t && col("a.n") >= col("b.n") * t)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard near-dup pairs via prefix filtering (the PPJoin
    * family): with every doc's shingle set sorted in one global order
    * (docFreq asc, shingle asc — rarest first), any pair with J ≥ t must
    * share an element within both docs' first `n - ceil(t*n) + 1` shingles —
    * so only prefixes enter the candidate join, and only candidates pay
    * exact verification (`array_intersect` on the full sets). The scale
    * path for Zipf-skewed corpora: head shingles outside prefixes never
    * join, so cost tracks near-dup density instead of Σ df².
    */
  def jaccardPairsPrefix(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, threshold: Double = 0.5
  ): DataFrame = {
    val t = threshold - 1e-4 // admit borderline pairs that round up to t
    // global order = (shingle docFreq asc, shingle asc): prefixes then hold
    // each doc's RAREST shingles, so candidate collisions track true
    // near-dup density instead of Zipf-head shingle frequency
    val par = df.sparkSession.sparkContext.defaultParallelism
    val ex = df.repartition(par)
      .select(col(idCol).as("id"), explode(shingles(col(textCol), w)).as("s"))
    val sdf = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val docs = ex.join(sdf, "s")
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(df, s))), x -> x.s)").as("sh"))
      .select(col("id"), col("sh"), size(col("sh")).as("n"))
    val pref = docs.select(col("id"), col("n"),
      explode(slice(col("sh"), lit(1),
        greatest(lit(0), (col("n") - ceil(col("n") * t) + 1).cast("int")))).as("s"))
      .repartition(par)
    val a = pref.as("a"); val b = pref.as("b")
    val cands = a.join(b,
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          col("b.n") >= col("a.n") * t && col("a.n") >= col("b.n") * t)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .join(docs.select(col("id").as("id_a"), col("sh").as("sa"), col("n").as("na")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("sh").as("sb"), col("n").as("nb")), "id_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Unbiased sampled estimate of the count-based join's candidate volume
    * Σ_s df(s)·(df(s)−1)/2 (the number of same-shingle doc pairs the
    * equi-join materializes): with uniform doc-sampling fraction f,
    * E[Σ df_s(df_s−1)] = f²·Σ df(df−1), so the sample statistic rescales by
    * 1/f².
    */
  def jaccardCandidateEstimate(
      df: DataFrame, textCol: String, w: Int, sampleFraction: Double = 0.02
  ): Double = {
    val sample = df.sample(withReplacement = false, sampleFraction, seed = 42L)
      .select(explode(shingles(col(textCol), w)).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * (col("df") - 1)).as("dfp"))
      .head()
    val dfp = if (sample.isNullAt(0)) 0L else sample.getLong(0)
    dfp.toDouble / 2.0 / (sampleFraction * sampleFraction)
  }

  /** Exact Jaccard pairs with measured strategy selection. The count-based
    * join's cost is its candidate-pair volume (quadratic in Zipf-head
    * docFreqs); the PPJoin prefix variant bounds candidates but pays two
    * extra full-data shuffles (df counting + rarest-first re-sort) —
    * A/B-measured 1.7× slower on corpora whose candidate volume is small.
    * So: estimate the candidate volume from a cheap sample and take
    * count-based while it stays under `maxCandidatePairs` (narrow rows
    * through one shuffle — minutes of cluster time at the default 5·10⁸);
    * web-scale Zipf corpora blow past the budget quadratically and route to
    * the prefix join, whose cost tracks near-dup density instead. Both
    * variants are exact and spec-proven identical, so routing never changes
    * results.
    */
  def jaccardPairsAuto(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, threshold: Double = 0.5,
      sampleFraction: Double = 0.02, maxCandidatePairs: Double = 5e8
  ): DataFrame =
    if (jaccardCandidateEstimate(df, textCol, w, sampleFraction) <= maxCandidatePairs)
      jaccardPairs(df, idCol, textCol, w, threshold)
    else jaccardPairsPrefix(df, idCol, textCol, w, threshold)

  /** MinHash signatures: `numHashes` permutations h_i(s) =
    * xxhash64(shingleHash, seed_i); signature = per-permutation min over the
    * doc's shingles. One narrow pass; the doc's shingle set never leaves its
    * partition. (xxhash64 is the deterministic mixer — native, codegen'd,
    * and overflow-free under ANSI mode.)
    */
  def minHashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, numHashes: Int = 32, seed: Long = 42L
  ): DataFrame = {
    val base = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        transform(shingles(col(textCol), w), s => xxhash64(s)).as("hs"))
    val sigCols = (0 until numHashes).map { i =>
      array_min(transform(col("hs"), h => xxhash64(h, lit(seed + i))))
    }
    base.select(col("id"), array(sigCols: _*).as("signature"))
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`,
    * bucket-join docs that agree on any full band, verify candidates with
    * exact signature similarity. Shuffles only on (band, bucketHash).
    */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      minSigSim: Double = 0.5, seed: Long = 42L
  ): DataFrame = {
    val sigs = minHashSignatures(df, idCol, textCol, w, bands * rowsPerBand, seed)
    // candidate pairs travel as bare (id_a, id_b) — signatures (8×rows longs
    // per doc) only re-attach after pair dedup, keeping the bucket-join
    // shuffle narrow
    val banded = sigs.select(col("id"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("signature"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand))), b)
        )).as(Seq("band", "bucket")))
    val a = banded.as("a"); val b = banded.as("b")
    val cands = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .join(sigs.select(col("id").as("id_a"), col("signature").as("sa")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("signature").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), p => p))
          .cast("double") / size(col("sa")), 4).as("sig_sim"))
      .where(col("sig_sim") >= minSigSim)
  }

  // ---------------------------------------------------- recall oracles
  //
  // The production pipelines above mix with xxhash64 (native, codegen'd).
  // xxhash64 exists in no other engine, so their outputs can only be
  // spec-gated. The *portable* variants below run the SAME pipeline shapes
  // under an md5-prefix hash family that any SQL engine reproduces
  // bit-for-bit (('0x'||substr(md5(x),1,8))::BIGINT — see
  // Sampling.hashBucket), making the recall entries' ENTIRE computation —
  // signatures, banding, verification, recall — independently computable
  // by the DuckDB oracle. md5 is ~10x costlier than xxhash64, which is why
  // production keeps xxhash.

  /** Portable 32-bit hash family: h_i(x) = int(md5(x ':' i)[0:8], 16). */
  def md5Hash32(c: Column, seed: Int): Column =
    conv(substring(md5(concat(c, lit(":" + seed))), 1, 8), 16, 10).cast("bigint")

  /** MinHash signatures under the portable hash family (shape of
    * [[minHashSignatures]]).
    */
  def minHashSignaturesPortable(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 2, numHashes: Int = 16
  ): DataFrame = {
    val base = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), shingles(col(textCol), w).as("sh"))
    val sigCols = (0 until numHashes).map { i =>
      array_min(transform(col("sh"), s => md5Hash32(s, i)))
    }
    base.select(col("id"), array(sigCols: _*).as("signature"))
  }

  /** LSH band pairs from precomputed signatures — the banding/verify shape
    * of [[minHashLshPairs]] with the raw band-signature string as the
    * bucket key (portable; production hashes the key to a long to keep the
    * shuffle narrow).
    */
  def lshBandPairsFromSigs(
      sigs: DataFrame, bands: Int, rowsPerBand: Int, minSigSim: Double
  ): DataFrame = {
    val banded = sigs.select(col("id"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",",
          slice(col("signature"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)))
      )).as(Seq("band", "bucket")))
    val a = banded.as("a"); val b = banded.as("b")
    val cands = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .join(sigs.select(col("id").as("id_a"), col("signature").as("sa")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("signature").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(size(filter(zip_with(col("sa"), col("sb"), (x, y) => x === y), p => p))
          .cast("double") / size(col("sa")), 4).as("sig_sim"))
      .where(col("sig_sim") >= minSigSim)
  }

  /** One-row (found, total, recall): exact-Jaccard pairs at or above
    * `truthThreshold` recovered by the portable minhash-LSH pipeline
    * operating at `threshold`. The two thresholds are deliberately
    * distinct — the standard LSH evaluation: an LSH scheme tuned at J=t
    * has provably DECAYING recall for pairs sitting exactly at t (the
    * S-curve's midpoint: a J=0.5 pair's 16-hash signature estimates < t
    * half the time), so the guarantee is stated for the band the pipeline
    * targets (J ≥ truthThreshold), while pairs between the thresholds are
    * best-effort. `recallFloor` is asserted in-entry, so the official
    * CORRECTNESS row gates approximation quality AND stability (the hash
    * family is deterministic).
    */
  def minHashRecall(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 2, threshold: Double = 0.5, truthThreshold: Double = 0.8,
      bands: Int = 8, rowsPerBand: Int = 2, minSigSim: Double = 0.5,
      recallFloor: Double = 0.0
  ): DataFrame = {
    val sigs = minHashSignaturesPortable(df, idCol, textCol, w, bands * rowsPerBand)
    val approx = lshBandPairsFromSigs(sigs, bands, rowsPerBand, minSigSim)
      .select(col("id_a"), col("id_b"))
    val exact = jaccardPairs(df, idCol, textCol, w, truthThreshold)
      .select(col("id_a"), col("id_b"))
    recallRow(df, exact, approx, recallFloor)
  }

  /** SimHash signatures under the portable hash family: 64-bit token hash
    * = md5 hex prefix halves (hi:lo) — same vote kernel
    * ([[graft.functions.VecExpressions.simHash64]]) as production.
    */
  def simHashPortable(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val df = df0.repartition(df0.sparkSession.sparkContext.defaultParallelism)
    val hs = transform(split(col(textCol), " "), t =>
      shiftleft(conv(substring(md5(t), 1, 8), 16, 10).cast("bigint"), 32)
        .bitwiseOR(conv(substring(md5(t), 9, 8), 16, 10).cast("bigint")))
    df.select(col(idCol).as("id"),
      graft.functions.VecExpressions.simHash64(hs).as("simhash"))
  }

  /** One-row (found, total, recall): exact-Jaccard pairs at or above
    * `truthThreshold` whose portable simhash signatures land within
    * `maxHamming` — band bucketing (pigeonhole, recall 1 on signatures) +
    * exact hamming verify, the [[simHashPairs]] shape. Hamming ≤ 3 of 64
    * targets near-identical documents, so the stated band is high-J (see
    * [[minHashRecall]] on threshold-vs-truth separation).
    */
  def simHashRecall(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 2, truthThreshold: Double = 0.9, maxHamming: Int = 3,
      recallFloor: Double = 0.0
  ): DataFrame = {
    val bands = maxHamming + 1
    val width = 64 / bands
    val sigs = simHashPortable(df, idCol, textCol)
    val bandCols = (0 until bands).map(bi =>
      shiftrightunsigned(col("simhash"), bi * width)
        .bitwiseAND(lit((1L << width) - 1)))
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bits")))
    val a = banded.as("a"); val b = banded.as("b")
    val approx = a.join(b,
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"))
    val exact = jaccardPairs(df, idCol, textCol, w, truthThreshold)
      .select(col("id_a"), col("id_b"))
    recallRow(df, exact, approx, recallFloor)
  }

  /** (found, total, recall) with the floor asserted; recall = 1 when the
    * exact set is empty (vacuous).
    */
  private[pipeline] def recallRow(
      df: DataFrame, exact: DataFrame, approx: DataFrame, recallFloor: Double
  ): DataFrame = {
    val total = exact.count()
    val found = exact.join(approx, Seq("id_a", "id_b"), "left_semi").count()
    val recall =
      if (total == 0) 1.0
      else BigDecimal(found.toDouble / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    require(recall >= recallFloor,
      s"recall $recall ($found/$total) below documented floor $recallFloor")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((found, total, recall)).toDF("found", "total", "recall")
  }

  /** SimHash: 64-bit signature = sign of per-bit weighted sums of token
    * hashes (weight = term frequency implicitly via duplicates). The vote
    * loop is the native codegen'd `simhash64` expression — one pass over
    * the token-hash array inside whole-stage codegen (the previous form,
    * 64 interpreted `aggregate` HOF passes, was the dominant cost of the
    * simhash pipeline). Bit-identical: per-bit votes are commutative
    * integer sums, ties still give 0.
    */
  def simHash(df0: DataFrame, idCol: String, textCol: String): DataFrame = {
    val df = df0.repartition(df0.sparkSession.sparkContext.defaultParallelism)
    val hs = transform(split(col(textCol), " "), t => xxhash64(t))
    df.select(col(idCol),
      graft.functions.VecExpressions.simHash64(hs).as("simhash"))
  }

  /** SimHash near-dup candidate pairs at hamming distance <= `maxHamming`:
    * the 64-bit signature is split into `maxHamming + 1` bands, and by
    * pigeonhole any pair within the distance agrees on at least one full
    * band — so candidates come from a bucketed (band, bandBits) equi-join
    * (never all-pairs), then exact hamming verification via
    * `bit_count(xor)`. Recall 1.0 by construction *on the signatures*;
    * signature→text recall is probabilistic (spec-measured).
    */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3
  ): DataFrame = {
    val bands = maxHamming + 1
    val width = 64 / bands // 16 bits per band for maxHamming = 3
    val sigs = simHash(df, idCol, textCol).select(col(idCol).as("id"), col("simhash"))
    val bandCols = (0 until bands).map(bi =>
      shiftrightunsigned(col("simhash"), bi * width)
        .bitwiseAND(lit((1L << width) - 1)))
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bits")))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs (exact, brute force): all pairs with
    * cosine >= threshold. The blocked all-pairs join is the *validation
    * baseline* — exact threshold joins over unstructured embeddings are
    * inherently Ω(n²) in the worst case; [[embeddingPairsLsh]] is the
    * shipped scale path (cost tracks bucket occupancy, recall < 1 on
    * structureless data, precision always 1 via exact verification).
    */
  def embeddingPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      maxRows: Long = 100000L
  ): DataFrame = {
    // Scale guard: this entry exists to validate embeddingPairsLsh at test
    // scale. Fail fast rather than let the Ω(n²) join run on real data.
    val n = df.count()
    require(n <= maxRows,
      s"embeddingPairs is the Ω(n²) exact validation baseline — refusing " +
        s"$n vectors (max $maxRows); use embeddingPairsLsh at scale")
    val v = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
    val a = v.as("a"); val b = v.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(Similarity.cosine(col("a.v"), col("b.v")), 4).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Embedding-cosine near-dup pairs, SRP-LSH bucketed (the 100 TB path):
    * candidates only for vectors sharing a (table, bucket) sign-random-
    * projection hash; candidates travel as bare id pairs through the bucket
    * join; vectors re-attach only for exact cosine verification. Precision
    * is exactly 1 (every emitted pair passed the exact threshold); recall
    * is the LSH collision probability `1 - (1 - (1 - θ/π)^planes)^tables`
    * per qualifying pair — high for genuinely near-duplicate vectors,
    * spec-measured on a planted-dup fixture. `planes` trades bucket size
    * (occupancy ≈ n / 2^planes per table) against recall.
    */
  def embeddingPairsLsh(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      dim: Int, planes: Int = 4, tables: Int = 8, seed: Long = 42L
  ): DataFrame = {
    val v = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
    val bucketed = v.select(col("id"),
      posexplode(array((0 until tables).map(t =>
        Similarity.srpBucket(col("v"), dim, planes, seed + t * 7919L)): _*))
        .as(Seq("table", "bucket")))
    val a = bucketed.as("a"); val b = bucketed.as("b")
    val cands = a.join(b,
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .join(v.select(col("id").as("id_a"), col("v").as("va")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("va"), col("vb")), 4).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** One-row (found, total, recall): exact cosine-threshold pairs recovered
    * by the SRP-LSH bucketed pipeline ([[embeddingPairsLsh]] verbatim —
    * its hyperplanes are already engine-portable: deterministic splitmix64
    * components the oracle inlines as literals). Precision is exactly 1
    * (exact verify), so found = |approx|∩|exact| = |approx|.
    */
  def embeddingRecall(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      dim: Int, planes: Int = 4, tables: Int = 8, seed: Long = 42L,
      recallFloor: Double = 0.0
  ): DataFrame = {
    val approx = embeddingPairsLsh(df, idCol, vecCol, threshold, dim, planes, tables, seed)
      .select(col("id_a"), col("id_b"))
    val exact = embeddingPairs(df, idCol, vecCol, threshold)
      .select(col("id_a"), col("id_b"))
    recallRow(df, exact, approx, recallFloor)
  }

  /** Connected components over near-dup pairs — the cluster-formation step
    * every dedup pipeline runs after pair generation: each node gets the
    * SMALLEST reachable id as its cluster id. Distributed min-label
    * propagation with a label-of-label compression step per round (the
    * pointer-doubling idea of the alternating-star MapReduce CC algorithms,
    * e.g. Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014): convergence in O(log n) rounds of two shuffles each, never
    * a driver-side union-find — node count at 100 TB exceeds any driver.
    * Deterministic (min is order-free).
    *
    * @return (id, cluster) for every id appearing in `pairs`
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 50,
      roundCounter: Option[java.util.concurrent.atomic.AtomicInteger] = None
  ): DataFrame = {
    // localCheckpoint truncates the logical plan each round — without it
    // the iterative lineage grows unboundedly and analysis time explodes
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .dropDuplicates("src", "dst")
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // each node pulls the min label among itself and its neighbors
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("nbr"))
      // carry the previous label through the round so convergence detection
      // needs no extra join against the prior state
      val pulled = labels.select(col("id"), col("comp").as("old"))
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nbr"), col("old"))).as("comp"))
      // compression: follow the label's label (halves chain length / round)
      val next = pulled.as("l1")
        .join(pulled.select(col("id").as("cid"), col("comp").as("ccomp")).as("l2"),
          col("l1.comp") === col("l2.cid"), "left")
        .select(col("l1.id").as("id"), col("l1.old").as("old"),
          least(col("l1.comp"), coalesce(col("ccomp"), col("l1.comp"))).as("comp"))
        .localCheckpoint(eager = false)
      // ONE action per round: the full-scan changed-count materializes every
      // partition of the lazy checkpoint as a side effect (the previous
      // eager-checkpoint + join + limit/count pair was a second Spark job
      // per round — O(log n) avoidable jobs per run)
      val changed = next
        .agg(count(when(col("comp") =!= col("old"), 1)).as("c"))
        .head().getLong(0)
      labels = next.select(col("id"), col("comp"))
      converged = changed == 0
      iter += 1
    }
    roundCounter.foreach(_.set(iter))
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id"), col("comp").as("cluster"))
  }

  /** Benchmark decontamination: drop training documents sharing more than
    * `maxShared` distinct word w-shingles with ANY document of the
    * evaluation set — the n-gram-overlap decontamination step of a
    * pretraining pipeline. The eval side is benchmark-sized, so its
    * distinct shingle set BROADCASTS to the train scan (one narrow
    * broadcast-hash join + a partial-agg count per train doc; the train
    * corpus never self-joins and never shuffles its text) — the 100 TB
    * shape.
    */
  def decontaminate(
      train: DataFrame, idCol: String, textCol: String,
      evalDf: DataFrame, evalTextCol: String,
      w: Int = 8, maxShared: Int = 0
  ): DataFrame = {
    require(w >= 1 && maxShared >= 0, s"bad params w=$w maxShared=$maxShared")
    val evalSh = evalDf
      .select(explode(shingles(col(evalTextCol), w)).as("__sh")).distinct()
    val contaminated = train
      .select(col(idCol), explode(shingles(col(textCol), w)).as("__sh"))
      .join(broadcast(evalSh), "__sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__shared")) // shingles() is per-doc distinct
      .where(col("__shared") > maxShared)
      .select(col(idCol))
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., arXiv 2303.09540):
    * cluster embeddings, then inside each cluster drop every vector that has
    * a LOWER-id cluster-mate with cosine ≥ `tau` (keep-lowest-id, the same
    * canonical-keeper rule the exact families use). Returns the KEPT rows as
    * (id, cluster), ordered by id.
    *
    * Clustering is k-medians Lloyd iteration made deterministic end-to-end
    * so an external SQL engine replicates the exact kept set:
    *
    *  - init: the vectors of the `k` smallest ids (no RNG);
    *  - assignment: squared distance folded left-to-right over dimensions
    *    (`zip_with` + `aggregate` — the same sequential order a SQL
    *    `list_sum(list_transform(..))` folds in), rounded to 9 dp before the
    *    argmin so a last-ULP accumulation difference cannot flip a cluster;
    *    ties break toward the lowest centroid index;
    *  - update: per-dimension MEDIAN, rounded to 6 dp — medians are order
    *    exact selections (or the mean of two, one addition), unlike a
    *    running float mean whose value depends on partition order (the same
    *    reasoning that made binary quantization center on the midrange).
    *
    * 100 TB shape: per iteration, assignment is a pure projection against
    * k×dim centroid LITERALS (no join, codegen'd), the update is one
    * (cluster, dim)-keyed shuffle collapsing to k×dim rows, and the driver
    * holds only the k×dim centroid table. The prune joins pairs WITHIN a
    * cluster only — with k grown ∝ corpus size (SemDeDup runs k ≈ n/10⁴),
    * cluster occupancy stays bounded and the pair join never approaches
    * all-pairs. `maxPairsPerCluster` fails fast if a degenerate clustering
    * would quadratically blow a cluster.
    */
  def semanticDedup(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 3, tau: Double = 0.7,
      maxPairsPerCluster: Long = 100000000L
  ): DataFrame = {
    require(k >= 1 && iters >= 1, s"bad k/iters $k/$iters")
    val spark = df.sparkSession
    val v = df.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    // deterministic init: the k lowest ids' vectors
    var centroids: Array[Array[Double]] = v.orderBy(col("id")).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(centroids.length == k, s"need ≥ $k vectors, got ${centroids.length}")

    def assigned: DataFrame = {
      // argmin over squared distances to centroid literals: left-to-right
      // dimension fold, 9-dp round, lowest index on ties
      val best = centroids.zipWithIndex.map { case (c, j) =>
        val carr = array(c.map(lit(_)): _*)
        val d = round(aggregate(
          zip_with(col("v"), carr, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x), 9)
        struct(d.as("d"), lit(j).as("j"))
      }.reduce((a, b) => when(b("d") < a("d"), b).otherwise(a))
      v.select(col("id"), col("v"), best("j").as("cluster"))
    }

    for (_ <- 1 to iters) {
      val cent = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(round(percentile(col("x"), lit(0.5)), 6).as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val byCluster = cent.groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
      // a cluster can empty out mid-iteration: its centroid stays put
      centroids = centroids.indices
        .map(j => byCluster.getOrElse(j, centroids(j))).toArray
    }

    val cl = assigned.localCheckpoint()
    val sizes = cl.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1))
    val worst = sizes.map(n => n * (n - 1) / 2).maxOption.getOrElse(0L)
    require(worst <= maxPairsPerCluster,
      s"degenerate clustering: $worst candidate pairs in one cluster " +
        s"(max $maxPairsPerCluster) — raise k")
    val a = cl.as("a"); val b = cl.as("b")
    val dropped = a.join(b,
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .where(round(Similarity.cosine(col("a.v"), col("b.v")), 4) >= tau)
      .select(col("b.id").as("id")).distinct()
    cl.join(dropped, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cluster"))
      .orderBy(col(idCol))
  }
}
