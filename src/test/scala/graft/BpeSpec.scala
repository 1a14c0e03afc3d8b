package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Bpe

/** BPE training/encoding (Sennrich ACL'16; mirrors `pipeline/Bpe`): exact
  * merge sequences on hand-computed corpora, the left-to-right
  * non-overlapping rule on symbol runs, tie-break determinism, partitioning
  * independence, and encode == final-symbol-table counts.
  */
class BpeSpec extends SparkTestBase {

  private def df(docs: (Long, String)*) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  private def mergeList(m: Bpe.BpeModel): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    m.merges.orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
  }

  private def segsOf(m: Bpe.BpeModel): Map[String, Seq[String]] = {
    import spark.implicits._
    m.symbols.orderBy("w", "pos").select("w", "sym").as[(String, String)]
      .collect().toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  test("hand-computed merge sequence on a tiny corpus") {
    // "low low lower": pairs after chars — (l,o) x3, (o,w) x3, (w,e) x1,
    // (e,r) x1. Tie (l,o) vs (o,w) at 3 → lexicographic: (l,o) first.
    val m = Bpe.train(df(1L -> "low low lower"), "text", 3)
    val got = mergeList(m)
    assert(got(0) == ((1, "l", "o", 3L)), got)
    // after merge 1: lo-w lo-w lo-w-e-r → (lo,w) x3 wins
    assert(got(1) == ((2, "lo", "w", 3L)), got)
    // after merge 2: low low low-e-r → (low,e) 1, (e,r) 1 → (e,r) lexicographic
    assert(got(2) == ((3, "e", "r", 1L)), got)
    assert(segsOf(m) == Map("low" -> Seq("low"), "lower" -> Seq("low", "er")))
  }

  test("run overlap: merges apply left-to-right, non-overlapping") {
    // "aaaa": (a,a) occurs at 3 overlapping positions but only 2 merges
    // apply (1st and 3rd in-run occurrences) → aa,aa; then (aa,aa) → aaaa
    val m = Bpe.train(df(1L -> "aaaa"), "text", 2)
    val got = mergeList(m)
    assert(got(0) == ((1, "a", "a", 3L)), got)
    assert(got(1) == ((2, "aa", "aa", 1L)), got)
    assert(segsOf(m) == Map("aaaa" -> Seq("aaaa")))
    // odd run: "aaa" → aa,a (trailing singleton survives)
    val m2 = Bpe.train(df(1L -> "aaa"), "text", 1)
    assert(segsOf(m2) == Map("aaa" -> Seq("aa", "a")))
  }

  test("training stops early when every word is one symbol") {
    val m = Bpe.train(df(1L -> "ab ab"), "text", 10)
    assert(mergeList(m) == Seq((1, "a", "b", 2L)))
    assert(segsOf(m) == Map("ab" -> Seq("ab")))
  }

  test("counts weight by word frequency, not distinct words") {
    // "xy" appears 3 times, "zq" once → (x,y)=3 beats (z,q)=1
    val m = Bpe.train(df(1L -> "xy xy zq", 2L -> "xy"), "text", 1)
    assert(mergeList(m).head == ((1, "x", "y", 3L)))
  }

  test("partitioning independence") {
    val base = df(1L -> "low low lower", 2L -> "lowest slow", 3L -> "glow low")
    val a = mergeList(Bpe.train(base, "text", 5))
    val b = mergeList(Bpe.train(base.repartition(7), "text", 5))
    assert(a == b)
    assert(a.size == 5)
  }

  test("encode: per-doc token counts equal the final segmentation") {
    val corpus = df(1L -> "low low lower", 2L -> "lower low")
    val m = Bpe.train(corpus, "text", 3)
    import spark.implicits._
    val got = Bpe.encode(corpus, "doc_id", "text", m)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // segmentation: low -> [low], lower -> [low, er]
    assert(got == Seq(1L -> 4L, 2L -> 3L), got)
  }
}
