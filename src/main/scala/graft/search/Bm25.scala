package graft.search

import graft.codec.SmallFloat
import graft.index.Schema.CollectionStats

/** BM25 scoring, reproducing the reference's float semantics exactly so that
  * top-k docIDs and scores are rank-identical
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java`):
  *
  *  - idf = (float) ln(1 + (N - n + 0.5) / (n + 0.5))             (:101-103)
  *  - avgdl = (float)(sumTotalTermFreq / (double) docCount)       (:106-108)
  *  - cache[i] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i]/avgdl)) (:180-184)
  *  - score = weight - weight / (1f + freq * cache[norm])          (:220-233)
  *  - multi-term idf sums per-term float idf into a double          (:160-169)
  *
  * All hot-path ops are JVM float ops — bit-identical to the reference on the
  * same JVM float semantics.
  */
object Bm25 {
  val DefaultK1 = 1.2f
  val DefaultB = 0.75f

  def idf(docFreq: Long, docCount: Long): Float =
    math.log(1 + (docCount - docFreq + 0.5d) / (docFreq + 0.5d)).toFloat

  def avgFieldLength(stats: CollectionStats): Float =
    (stats.sumTotalTermFreq / stats.docCount.toDouble).toFloat

  /** Double-precision variant with the same formula shape — used by the
    * SQL-oracle-checked query entries so a DuckDB double-math brute-force
    * produces bit-comparable scores (after 6-dp rounding). Quantized norms
    * still apply.
    */
  def idfD(docFreq: Long, docCount: Long): Double =
    math.log(1 + (docCount - docFreq + 0.5d) / (docFreq + 0.5d))

  def avgFieldLengthD(stats: CollectionStats): Double =
    stats.sumTotalTermFreq / stats.docCount.toDouble
}

/** Scorer abstraction over precision modes; `score(freq, normByte)` and an
  * upper bound used for block-max pruning. Upper bounds must never
  * underestimate the actual score.
  */
sealed trait SimScorer extends Serializable {
  def weightD: Double // per-term weight upper bound helper
  def score(freq: Int, norm: Int): Double

  /** Fractional-frequency variant — the reference's `SimScorer.score(float
    * freq, long norm)` takes a float freq, which `CombinedFieldQuery`
    * exploits to score weighted cross-field frequency sums
    * (`CombinedFieldScorer#freq()`). Defaults to the same formula with the
    * frequency left unrounded.
    */
  def scoreF(freq: Double, norm: Int): Double = score(freq.toInt, norm)

  /** Upper bound used when scoring an impact-skyline pair for block-max
    * pruning. The skyline keeps pairs competitive under "score grows with
    * freq, shrinks with norm" — sound for every monotone similarity, where
    * this default (the score itself) is tight. A similarity whose length
    * normalization is NOT antitone in the norm (SweetSpot's plateau
    * penalizes short docs too) must override this with a norm-independent
    * bound, or pruning may discard true top-k hits.
    */
  def boundScore(freq: Int, norm: Int): Double = score(freq, norm)
}

/** Float-exact BM25 per-term scorer (rank-identity mode). */
final class Bm25FloatScorer(k1: Float, b: Float, val weight: Float, avgdl: Float)
    extends SimScorer {
  private val cache: Array[Float] = Array.tabulate(256) { i =>
    1f / (k1 * ((1 - b) + b * SmallFloat.lengthTable(i) / avgdl))
  }
  def score(freq: Int, norm: Int): Double = {
    val normInverse = cache(norm & 0xff)
    (weight - weight / (1f + freq * normInverse)).toDouble
  }
  override def scoreF(freq: Double, norm: Int): Double = {
    val normInverse = cache(norm & 0xff)
    (weight - weight / (1f + freq.toFloat * normInverse)).toDouble
  }
  def weightD: Double = weight.toDouble
}

/** Double BM25 per-term scorer (oracle-SQL-comparable mode). */
final class Bm25DoubleScorer(k1: Double, b: Double, val weight: Double, avgdl: Double)
    extends SimScorer {
  private val cache: Array[Double] = Array.tabulate(256) { i =>
    1d / (k1 * ((1 - b) + b * SmallFloat.lengthTable(i) / avgdl))
  }
  def score(freq: Int, norm: Int): Double = {
    val normInverse = cache(norm & 0xff)
    weight - weight / (1d + freq * normInverse)
  }
  override def scoreF(freq: Double, norm: Int): Double = {
    val normInverse = cache(norm & 0xff)
    weight - weight / (1d + freq * normInverse)
  }
  def weightD: Double = weight
}

/** Constant-score per-term scorer (golden WAND fixtures + FILTER clauses).
  * Also serves as BooleanSimilarity (score = boost, freq/norm ignored, ref
  * `search/similarities/BooleanSimilarity.java`).
  */
final class ConstScorer(val value: Double) extends SimScorer {
  def score(freq: Int, norm: Int): Double = value
  def weightD: Double = value
}

/** Dirichlet-smoothed language-model scorer (ref
  * `search/similarities/LMDirichletSimilarity.java:score` +
  * `LMSimilarity.DefaultCollectionModel`): score = boost·max(0,
  * ln(1 + freq/(μ·p)) + ln(μ/(dl + μ))), p = (ttf+1)/(sttf+1), dl = the
  * decoded quantized length. The reference computes in double and narrows
  * the final value to float — `floatExact` reproduces that narrowing.
  * Monotone in freq, antitone in dl, clamped non-negative → the impacts
  * skyline bounds it like BM25.
  */
final class LmDirichletScorer(
    mu: Double, boost: Double, p: Double, floatExact: Boolean) extends SimScorer {
  def score(freq: Int, norm: Int): Double = scoreF(freq.toDouble, norm)
  override def scoreF(freq: Double, norm: Int): Double = {
    val dl = SmallFloat.lengthTable(norm & 0xff).toDouble
    val s = boost * (math.log(1 + freq / (mu * p)) + math.log(mu / (dl + mu)))
    val clamped = if (s > 0.0) s else 0.0
    if (floatExact) clamped.toFloat.toDouble else clamped
  }
  def weightD: Double = boost
}

/** Jelinek-Mercer-smoothed language-model scorer (ref
  * `search/similarities/LMJelinekMercerSimilarity.java:score`): score =
  * boost·ln(1 + ((1−λ)·freq/dl) / (λ·p)), p = (ttf+1)/(sttf+1), dl = the
  * decoded quantized length; non-negative by construction, monotone in
  * freq and antitone in dl, so the impacts skyline bounds it.
  */
final class LmJelinekMercerScorer(
    lambda: Double, boost: Double, p: Double, floatExact: Boolean) extends SimScorer {
  def score(freq: Int, norm: Int): Double = scoreF(freq.toDouble, norm)
  override def scoreF(freq: Double, norm: Int): Double = {
    val dl = SmallFloat.lengthTable(norm & 0xff).toDouble
    val s = boost * math.log(1 + ((1 - lambda) * freq / dl) / (lambda * p))
    if (floatExact) s.toFloat.toDouble else s
  }
  def weightD: Double = boost
}

/** Divergence-from-randomness scorer (ref
  * `search/similarities/DFRSimilarity.java:127-131` composition): score =
  * boost · A · ae · (1 − 1/(1 + tfn)), the rewritten monotone form where
  *
  *  - A = the basic model's information content — I(n): log2((N+1)/(n+0.5))
  *    (`BasicModelIn.java:34-45`); I(F): log2(1 + (N+1)/(F+0.5))
  *    (`BasicModelIF.java:34-45`) — precomputed into `a`;
  *  - ae = the after-effect times (1+tfn) — B: (F+1)/n
  *    (`AfterEffectB.java:32-36`); L: 1 (`AfterEffectL.java`) — precomputed
  *    into `ae`;
  *  - tfn = normalized term frequency — H1: freq·c·avgdl/dl
  *    (`NormalizationH1.java:56-58`); H2: freq·log2(1 + c·avgdl/dl)
  *    (`NormalizationH2.java:57-59`).
  *
  * Monotone in freq, antitone in dl → bounded by the impacts skyline.
  * `floatExact` narrows the final double like `SimilarityBase$BasicSimScorer
  * #score` (:188-190).
  */
final class DfrScorer(
    a: Double, ae: Double, norm3: TfNormParams, avgdl: Double,
    boost: Double, floatExact: Boolean) extends SimScorer {
  def score(freq: Int, norm: Int): Double = scoreF(freq.toDouble, norm)
  override def scoreF(freq: Double, norm: Int): Double = {
    val dl = SmallFloat.lengthTable(norm & 0xff).toDouble
    val tfn = norm3.tfn(freq, dl, avgdl)
    val s = boost * a * ae * (1 - 1 / (1 + tfn))
    if (floatExact) s.toFloat.toDouble else s
  }
  // score → boost·a·ae as tfn → ∞: a true upper bound
  def weightD: Double = boost * a * ae
}
object DfrScorer { val Log2: Double = math.log(2.0) }

/** Normalized term frequency tfn(freq, dl) shared by DFR and IB (ref the
  * `Normalization` hierarchy): H1 linear (`NormalizationH1.java:56-58`), H2
  * logarithmic (`NormalizationH2.java:57-59`), H3 Dirichlet-prior smoothing
  * (`NormalizationH3.java:49-53`; `p` = the reference's float-narrowed
  * (ttf+1f)/(sumTtf+1f)), Z Pareto-Zipf (`NormalizationZ.java:49-51`).
  * Every variant is increasing in freq and decreasing in dl, preserving the
  * impacts-skyline bound.
  */
final case class TfNormParams(kind: Int /*0=H1 1=H2 2=H3 3=Z*/, c: Double, p: Double) {
  def tfn(freq: Double, dl: Double, avgdl: Double): Double = kind match {
    case 0 => freq * c * avgdl / dl
    case 1 => freq * (math.log(1 + c * avgdl / dl) / DfrScorer.Log2)
    case 2 => (freq + c * p) / (dl + c) * c // c = mu (NormalizationH3:50-52)
    case _ => freq * math.pow(avgdl / dl, c) // c = z  (NormalizationZ:50)
  }
}

/** Information-based scorer (ref `search/similarities/IBSimilarity.java`
  * score = boost · distribution(tfn, λ)):
  *
  *  - distribution LL: −ln(λ/(tfn+λ)) (`DistributionLL.java:34`); SPL:
  *    −ln((λ^(tfn/(tfn+1)) − λ)/(1 − λ)) with the reference's nextUp/nextDown
  *    rounding guards (`DistributionSPL.java:35-58`);
  *  - λ — DF: (n+1)/(N+1) (`LambdaDF.java:36-40`); TTF: (F+1)/(N+1)
  *    (`LambdaTTF.java:36-41`) — precomputed into `lambda` (the reference
  *    narrows λ itself to float; reproduced in floatExact mode at
  *    construction);
  *  - tfn as in [[DfrScorer]] (same Normalization classes).
  *
  * Monotone in freq, antitone in dl (λ ∈ (0,1)) → impacts-skyline bounded.
  */
final class IbScorer(
    spl: Boolean, lambda: Double, norm3: TfNormParams, avgdl: Double,
    boost: Double, floatExact: Boolean) extends SimScorer {
  def score(freq: Int, norm: Int): Double = scoreF(freq.toDouble, norm)
  override def scoreF(freq: Double, norm: Int): Double = {
    val dl = SmallFloat.lengthTable(norm & 0xff).toDouble
    val tfn = norm3.tfn(freq, dl, avgdl)
    val d =
      if (!spl) -math.log(lambda / (tfn + lambda))
      else {
        var q = 1 - 1 / (tfn + 1)
        if (q == 1) q = math.nextDown(1.0)
        var pow = math.pow(lambda, q)
        if (pow == lambda) // float rounding would give log(0) (ref :47-56)
          pow = if (lambda < 1) math.nextUp(lambda) else math.nextDown(lambda)
        -math.log((pow - lambda) / (1 - lambda))
      }
    val s = boost * d
    if (floatExact) s.toFloat.toDouble else s
  }
  // like LM-JM: unbounded in freq; block-max bounds come from the impacts
  // skyline (score() over the block's (freq, norm) frontier), not weightD
  def weightD: Double = boost
}

/** Divergence-from-independence scorer (ref
  * `search/similarities/DFISimilarity.java:score`): expected =
  * (F+1)·dl/(sttf+1); score 0 when freq ≤ expected, else boost ·
  * log2(measure+1) with measure ∈ {Standardized (f−e)/√e, Saturated
  * (f−e)/e, ChiSquared (f−e)²/e} (`IndependenceStandardized/Saturated/
  * ChiSquared.java`). Monotone in freq, antitone in dl (expected grows
  * with dl) → impacts-skyline bounded.
  */
final class DfiScorer(
    measure: Int /* 0=Standardized 1=Saturated 2=ChiSquared */,
    ttf: Long, sttf: Long, boost: Double, floatExact: Boolean) extends SimScorer {
  def score(freq: Int, norm: Int): Double = scoreF(freq.toDouble, norm)
  override def scoreF(freq: Double, norm: Int): Double = {
    val dl = SmallFloat.lengthTable(norm & 0xff).toDouble
    val expected = (ttf + 1) * dl / (sttf + 1)
    if (freq <= expected) return 0.0
    val m = measure match {
      case 0 => (freq - expected) / math.sqrt(expected)
      case 1 => (freq - expected) / expected
      case _ => (freq - expected) * (freq - expected) / expected
    }
    val s = boost * (math.log(m + 1) / DfrScorer.Log2)
    if (floatExact) s.toFloat.toDouble else s
  }
  def weightD: Double = boost
}

/** Axiomatic-retrieval scorer (ref `search/similarities/Axiomatic.java`
  * score composition, :111-118): score = max(0, boost · (tf · ln · tfln ·
  * idf − gamma)) where the six F{1,2,3}{EXP,LOG} variants pick components
  * (`AxiomaticF1EXP/F1LOG/F2EXP/F2LOG/F3EXP/F3LOG.java`):
  *
  *  - tf (F1/F3) = 1 + ln(1 + ln(freq + 1)); 1 for F2;
  *  - ln (F1) = (avgdl + s)/(avgdl + dl·s); 1 for F2/F3;
  *  - tfln (F2) = freq/(freq + s + s·dl/avgdl); 1 for F1/F3;
  *  - idf — EXP: ((N+1)/n)^k; LOG: ln((N+1)/n) — precomputed into `idf`;
  *  - gamma (F3) = (dl − queryLen)·s·queryLen/avgdl; 0 for F1/F2.
  *
  * Every component is non-decreasing in freq and non-increasing in dl
  * (gamma grows with dl and is subtracted), so the impacts skyline bounds
  * the score like the other models. `floatExact` narrows the final double
  * like `SimilarityBase$BasicSimScorer#score`.
  */
final class AxiomaticScorer(
    tfOn: Boolean, lnOn: Boolean, tflnOn: Boolean, gammaOn: Boolean,
    idf: Double, s: Double, queryLen: Int, avgdl: Double,
    boost: Double, floatExact: Boolean) extends SimScorer {
  def score(freq: Int, norm: Int): Double = scoreF(freq.toDouble, norm)
  override def scoreF(freq: Double, norm: Int): Double = {
    val dl = SmallFloat.lengthTable(norm & 0xff).toDouble
    val tf = if (tfOn) 1 + math.log(1 + math.log(freq + 1)) else 1.0
    val ln = if (lnOn) (avgdl + s) / (avgdl + dl * s) else 1.0
    val tfln = if (tflnOn) freq / (freq + s + s * dl / avgdl) else 1.0
    val gamma = if (gammaOn) (dl - queryLen) * s * queryLen / avgdl else 0.0
    val sc = boost * (tf * ln * tfln * idf - gamma)
    val clamped = if (sc > 0.0) sc else 0.0
    if (floatExact) clamped.toFloat.toDouble else clamped
  }
  def weightD: Double = boost * idf
}

object AxiomaticScorer {
  /** Build the variant's component mix from (pseudo-)term stats — idf is a
    * pure function of (df, N, k), precomputed here; the per-(freq, norm)
    * components run inside the scorer.
    */
  def apply(ax: Similarity.Axiomatic, df: Long, docCount: Long,
            sumTtf: Long, boost: Double, floatExact: Boolean): AxiomaticScorer = {
    import Similarity.AxVariant._
    val exp = ax.variant match {
      case F1EXP | F2EXP | F3EXP => true
      case _                     => false
    }
    val idf =
      if (exp) math.pow((docCount + 1.0) / df, ax.k) // AxiomaticF1EXP:79-81
      else math.log((docCount + 1.0) / df) // AxiomaticF1LOG:71-73
    val (tfOn, lnOn, tflnOn, gammaOn) = ax.variant match {
      case F1EXP | F1LOG => (true, true, false, false)
      case F2EXP | F2LOG => (false, false, true, false)
      case F3EXP | F3LOG => (true, false, false, true)
    }
    new AxiomaticScorer(tfOn, lnOn, tflnOn, gammaOn, idf, ax.s, ax.queryLen,
      sumTtf / docCount.toDouble, boost, floatExact)
  }
}

/** Raw-term-frequency scorer (ref `RawTFSimilarity.java`: score =
  * boost·freq, norm ignored). Monotone in freq, constant in dl.
  */
final class RawTfScorer(boost: Double, floatExact: Boolean) extends SimScorer {
  def score(freq: Int, norm: Int): Double = scoreF(freq.toDouble, norm)
  override def scoreF(freq: Double, norm: Int): Double =
    if (floatExact) (boost.toFloat * freq.toFloat).toDouble else boost * freq
  def weightD: Double = boost
}

/** Sum of sub-scorers (ref `MultiSimilarity.MultiSimScorer:55-69`: the subs
  * accumulate in a double, the result narrows to float in float-exact
  * mode). Monotonicity in freq / antitonicity in dl is inherited from every
  * sub-model, so the impacts skyline still bounds the sum.
  */
final class SumSimScorer(subsSeq: Seq[SimScorer], floatExact: Boolean) extends SimScorer {
  private val subs: Array[SimScorer] = subsSeq.toArray
  def score(freq: Int, norm: Int): Double = {
    var s = 0.0; var i = 0
    while (i < subs.length) { s += subs(i).score(freq, norm); i += 1 }
    if (floatExact) s.toFloat.toDouble else s
  }
  override def scoreF(freq: Double, norm: Int): Double = {
    var s = 0.0; var i = 0
    while (i < subs.length) { s += subs(i).scoreF(freq, norm); i += 1 }
    if (floatExact) s.toFloat.toDouble else s
  }
  def weightD: Double = subs.map(_.weightD).sum
}

/** Feature-value scorer (ref `document/FeatureField.java` LinearFunction /
  * LogFunction / SaturationFunction SimScorers): the posting frequency IS
  * the 17-bit float encoding of the feature value; the score is a monotone
  * transform of the decoded value and ignores the norm entirely. Float mode
  * reproduces the reference's float arithmetic; double mode mirrors a SQL
  * double-math oracle.
  */
final class FeatureSimScorer(
    fn: FeatureFunction, w: Double, floatExact: Boolean) extends SimScorer {
  def score(freq: Int, norm: Int): Double = {
    val v = graft.index.FeatureIndexer.decodeValue(freq)
    if (floatExact) (fn match {
      case FeatureFunction.Linear => w.toFloat * v
      case FeatureFunction.Log(a) =>
        (w * math.log(a + v)).toFloat // ref FeatureField.java:338 float cast
      case FeatureFunction.Saturation(k) =>
        // ref FeatureField.java:414: 1 - k/(f+k), the form that stays
        // monotone in f under float rounding
        w.toFloat * (1f - k.toFloat / (v + k.toFloat))
    }).toDouble
    else fn match {
      case FeatureFunction.Linear        => w * v
      case FeatureFunction.Log(a)        => w * math.log(a + v)
      case FeatureFunction.Saturation(k) => w * (1d - k / (v + k))
    }
  }
  def weightD: Double = w
}

/** ClassicSimilarity (TF-IDF) statistics, reproducing the reference's float
  * semantics (`search/similarities/ClassicSimilarity.java`):
  *
  *  - idf = (float)(log((docCount+1)/(docFreq+1)) + 1)              (:69-71)
  *  - tf = (float) sqrt(freq)                                        (:50-53)
  *  - lengthNorm = (float)(1/sqrt(length))                           (:40-47)
  *  - score = tf(freq) * queryWeight * normTable[norm & 0xFF], with
  *    normTable[0] = 1f/normTable[255] (`TFIDFSimilarity.java:442-448,
  *    472-476`)
  */
object TfIdf {
  def idf(docFreq: Long, docCount: Long): Float =
    (math.log((docCount + 1) / (docFreq + 1).toDouble) + 1.0).toFloat

  def idfD(docFreq: Long, docCount: Long): Double =
    math.log((docCount + 1) / (docFreq + 1).toDouble) + 1.0
}

/** Float-exact ClassicSimilarity per-term scorer (rank-identity mode);
  * `weight` = boost * idf (the reference's queryWeight).
  */
final class TfIdfFloatScorer(val weight: Float) extends SimScorer {
  private val normTable: Array[Float] = {
    val t = Array.tabulate(256) { i =>
      (1.0 / math.sqrt(SmallFloat.lengthTable(i).toDouble)).toFloat
    }
    t(0) = 1f / t(255) // length-0 sentinel, ref TFIDFSimilarity.java:447
    t
  }
  def score(freq: Int, norm: Int): Double = {
    val raw = math.sqrt(freq.toDouble).toFloat * weight
    (raw * normTable(norm & 0xff)).toDouble
  }
  override def scoreF(freq: Double, norm: Int): Double = {
    val raw = math.sqrt(freq).toFloat * weight
    (raw * normTable(norm & 0xff)).toDouble
  }
  def weightD: Double = weight.toDouble
}

/** SweetSpotSimilarity per-term scorer (ref
  * `misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java`): the
  * classic TF-IDF frame with a plateau length norm —
  * `1/sqrt(steep·(|dl−min|+|dl−max|−(max−min))+1)`, flat 1.0 inside
  * [lnMin,lnMax], sqrt falloff outside — and a baseline tf,
  * `tf ≤ tfMin ? tfBase : sqrt(tf + tfBase² − tfMin)` (0 at tf=0). The
  * length norm penalizes SHORT docs too, so it is not antitone in the norm
  * byte: [[boundScore]] bounds with the plateau value (lengthNorm ≤ 1) to
  * keep the impact-skyline pruning sound. `weight` = boost · Σ idf, dl = the
  * SmallFloat-decoded quantized length (same byte4 pipeline as Classic).
  */
final class SweetSpotScorer(
    val weight: Double, lnMin: Int, lnMax: Int, steep: Double,
    tfBase: Double, tfMin: Double, floatExact: Boolean) extends SimScorer {
  private val normTable: Array[Double] = {
    val t = Array.tabulate(256) { i =>
      val dl = SmallFloat.lengthTable(i).toDouble
      1.0 / math.sqrt(
        steep * (math.abs(dl - lnMin) + math.abs(dl - lnMax) - (lnMax - lnMin)) + 1.0)
    }
    t(0) = t(255) // length-0 sentinel convention, as TFIDFSimilarity's table
    t
  }
  private def tf(freq: Double): Double =
    if (freq == 0.0) 0.0
    else if (freq <= tfMin) tfBase
    else math.sqrt(freq + tfBase * tfBase - tfMin)
  def score(freq: Int, norm: Int): Double = scoreF(freq.toDouble, norm)
  override def scoreF(freq: Double, norm: Int): Double = {
    val s = tf(freq) * weight * normTable(norm & 0xff)
    if (floatExact) s.toFloat.toDouble else s
  }
  override def boundScore(freq: Int, norm: Int): Double = tf(freq.toDouble) * weight
  def weightD: Double = weight
}

/** Double ClassicSimilarity per-term scorer (oracle-SQL-comparable mode). */
final class TfIdfDoubleScorer(val weight: Double) extends SimScorer {
  private val normTable: Array[Double] = {
    val t = Array.tabulate(256) { i =>
      1.0 / math.sqrt(SmallFloat.lengthTable(i).toDouble)
    }
    t(0) = 1d / t(255)
    t
  }
  def score(freq: Int, norm: Int): Double =
    math.sqrt(freq.toDouble) * weight * normTable(norm & 0xff)
  override def scoreF(freq: Double, norm: Int): Double =
    math.sqrt(freq) * weight * normTable(norm & 0xff)
  def weightD: Double = weight
}
