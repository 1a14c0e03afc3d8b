package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document classifiers over labeled corpora — the Spark re-expression of the
  * reference's classification module
  * (`/root/reference/lucene/classification/src/java/org/apache/lucene/classification/`).
  * The kNN classifier (`KNearestNeighborClassifier.java`) is query-side
  * (BM25 neighbors vote — see the `ft_knn_classify` entry); this file holds
  * the model-side classifiers that train on corpus statistics.
  */
object Classify {

  /** Multinomial Naive Bayes with add-one smoothing
    * (`SimpleNaiveBayesClassifier.java:155-243`: class prior × per-token
    * likelihood, `ln`-summed to avoid underflow):
    *
    * {{{
    * score(c | d) = ln P(c) + Σ_{t ∈ d ∩ V} tf(t,d) · ln( (tf(t,c) + 1) / (tot_c + |V|) )
    * }}}
    *
    * where V is the training vocabulary, `tot_c` the token count of class c,
    * and test tokens outside V are dropped (both factors of the smoothed
    * likelihood are undefined for them). The Σ is computed as
    * `Σ tf·ln(tf(t,c)+1) − len_d·ln(tot_c+|V|)` so absent (t, c) pairs
    * contribute exactly 0 to the first sum — no zero-filled V×C matrix is
    * ever materialized.
    *
    * Scale shape: the model (class term counts, class constants, vocabulary)
    * is aggregated once and broadcast — model size is O(|V|·C), independent
    * of corpus size; the test side is two narrow shuffles keyed by doc. The
    * driver holds only two scalars (train doc count, |V|).
    *
    * @return one row per test doc: (id, pred, score) — the argmax class and
    *         its 6-dp-rounded log-score; ties broken by label ascending.
    */
  def naiveBayes(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String
  ): DataFrame = {
    val tokTrain = train.select(
      col(labelCol).as("label"),
      explode(split(col(textCol), " ")).as("term"))
    val classTf = tokTrain.groupBy(col("label"), col("term"))
      .agg(count(lit(1)).cast("double").as("ctf"))
    val classTot = classTf.groupBy(col("label")).agg(sum(col("ctf")).as("tot"))
    val nDocs = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).cast("double").as("ndocs"))
    val totalDocs = train.count().toDouble
    val vocab = classTf.select(col("term")).distinct()
    val v = vocab.count().toDouble

    // per-(test doc, in-vocab term) freqs; OOV tokens drop at the join
    val testTf = test.select(
        col(idCol).as("id"), explode(split(col(textCol), " ")).as("term"))
      .join(broadcast(vocab), "term")
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tfd"))
    val dlen = testTf.groupBy(col("id")).agg(sum(col("tfd")).as("dlen"))
    val hit = testTf.join(broadcast(classTf), "term")
      .groupBy(col("id"), col("label"))
      .agg(sum(col("tfd") * log(col("ctf") + 1)).as("hit"))
    val classConst = nDocs.join(classTot, "label").select(
      col("label"),
      log(col("ndocs") / lit(totalDocs)).as("lprior"),
      log(col("tot") + lit(v)).as("ldenom"))

    val scored = dlen.crossJoin(broadcast(classConst))
      .join(hit, Seq("id", "label"), "left")
      .na.fill(0.0, Seq("hit"))
      .select(col("id"), col("label"),
        (col("lprior") + col("hit") - col("dlen") * col("ldenom")).as("score"))
    val w = Window.partitionBy(col("id"))
      .orderBy(round(col("score"), 6).desc, col("label").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("id"), col("label").as("pred"), round(col("score"), 6).as("score"))
  }
}
