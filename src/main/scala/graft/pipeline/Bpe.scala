package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenization (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units", ACL 2016
  * — the reference BPE learner): iteratively merge the most frequent
  * adjacent symbol pair over a whitespace-pre-tokenized corpus, then encode
  * documents by the learned segmentation. The LLM-pipeline operator behind
  * every "token count" a training-data budget is denominated in.
  *
  * Execution shape (the paper's own trick, kept at 100 TB scale): training
  * runs over the DISTINCT-WORD HISTOGRAM, never the corpus — one exploded
  * count aggregation bounds everything after it by the vocabulary, not the
  * token count. Each merge iteration is one per-word window pass (bounded
  * by word length, never corpus-wide) + one pair-count aggregation + a
  * 1-row argmax collect, with a `localCheckpoint` barrier so the plan stays
  * flat across iterations (the PageRank superstep shape). Production
  * trainers at 30k+ merges maintain pair counts incrementally instead of
  * re-counting; the re-count per merge is the paper's algorithm and keeps
  * every step engine-replicable in SQL.
  *
  * Determinism: all-integer pair counts; argmax ties break lexicographically
  * on (left, right); merge application is the standard LEFT-TO-RIGHT
  * non-overlapping rule, realized order-independently via run arithmetic —
  * within each maximal run of consecutive pair occurrences (only possible
  * when left == right, e.g. "aaaa" under (a,a)), the 1st, 3rd, ... occurrences
  * merge. Output is a pure function of the corpus: rerun-stable,
  * partitioning-independent, and a SQL oracle replays it exactly.
  */
object Bpe {

  /** Final training state: the learned merges in rank order and the
    * symbol table after all merges (each distinct word's segmentation —
    * which IS the encoding of every corpus word, so `encode` is a join).
    */
  final case class BpeModel(merges: DataFrame, symbols: DataFrame)

  private def wordsOf(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))

  /** Learn `numMerges` BPE merges over the whitespace vocabulary of
    * `textCol`. Returns the merge table (rank, pair_left, pair_right,
    * pair_count) and the post-merge symbol table (w, cnt, pos, sym).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int): BpeModel = {
    require(numMerges >= 1 && numMerges <= 64, s"bad numMerges $numMerges")
    val spark = df.sparkSession
    import spark.implicits._

    // initial symbols: one row per (word, char position) — histogram-sized
    var syms = wordsOf(df, textCol)
      .select($"w", $"cnt", explode(expr("sequence(1, length(w))")).as("pos"))
      .withColumn("sym", expr("substring(w, pos, 1)"))
      .localCheckpoint()

    val byPos = Window.partitionBy($"w").orderBy($"pos")
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val paired = syms.withColumn("nxt", lead($"sym", 1).over(byPos))
      val best = paired.where($"nxt".isNotNull)
        .groupBy($"sym".as("a"), $"nxt".as("b"))
        .agg(sum($"cnt").as("c"))
        .orderBy($"c".desc, $"a".asc, $"b".asc)
        .limit(1).as[(String, String, Long)].collect()
      if (best.isEmpty) exhausted = true // every word is a single symbol
      else {
        val (a, b, c) = best(0)
        merges += ((rank, a, b, c))
        // left-to-right non-overlapping application via run arithmetic:
        // islands of CONSECUTIVE pair occurrences merge at odd positions
        // within the island (island length > 1 only when a == b)
        // coalesce: the last position's nxt is NULL → mark must be FALSE,
        // not NULL (a three-valued mark would split the window partitions)
        val marked = paired.withColumn("mark",
          coalesce($"sym" === a && $"nxt" === b, lit(false)))
          .withColumn("mrn",
            row_number().over(Window.partitionBy($"w", $"mark").orderBy($"pos")))
          .withColumn("island", when($"mark", $"pos" - $"mrn"))
        val offd = marked.withColumn("off",
          when($"mark", row_number().over(
            Window.partitionBy($"w", $"mark", $"island").orderBy($"pos"))))
          .withColumn("mstart", $"mark" && $"off" % 2 === 1)
        val applied = offd
          .withColumn("consumed",
            coalesce(lag($"mstart", 1).over(byPos), lit(false)))
          .where(!$"consumed")
          .select($"w", $"cnt",
            row_number().over(byPos).as("pos"),
            when($"mstart", concat($"sym", $"nxt")).otherwise($"sym").as("sym"))
        syms = applied.localCheckpoint() // flat plan per superstep
        rank += 1
      }
    }
    BpeModel(
      merges.result().toDF("merge_rank", "pair_left", "pair_right", "pair_count"),
      syms)
  }

  /** Per-document BPE token counts under a trained model: every corpus word
    * appears in the training histogram, so encoding is ONE join of the
    * doc-word explode against the per-word symbol counts — no per-doc merge
    * replay. (Out-of-vocabulary words — encoding a DIFFERENT corpus — would
    * need the merge replay; this operator encodes the training corpus, the
    * token-budget accounting case.)
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame = {
    val wlen = model.symbols.groupBy(col("w")).agg(count(lit(1)).as("ns"))
    df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .join(wlen, "w")
      .groupBy(col(idCol)).agg(sum(col("ns")).as("n_bpe"))
  }
}
