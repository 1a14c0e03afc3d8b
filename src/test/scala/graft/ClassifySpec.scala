package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Classify, TextOps}

/** Naive Bayes classifier (hand-computed fixture) and shingle column op. */
class ClassifySpec extends SparkTestBase {

  test("naive bayes matches hand-computed log-scores") {
    import spark.implicits._
    // class a: x x y | x y  (tot 5, 2 docs); class b: y z (tot 2, 1 doc)
    // V = {x,y,z}; test "x z":
    //   score(a) = ln(2/3) + ln(3+1) - 2*ln(5+3) = -3.178054
    //   score(b) = ln(1/3) + ln(1+1) - 2*ln(2+3) = -3.624341
    val train = Seq((1L, "a", "x x y"), (2L, "a", "x y"), (3L, "b", "y z"))
      .toDF("id", "label", "text")
    val test = Seq((10L, "x z")).toDF("id", "text")
    val out = Classify.naiveBayes(train, test, "id", "text", "label").collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("pred") == "a")
    assert(math.abs(out(0).getAs[Double]("score") - (-3.178054)) < 1e-5)
  }

  test("naive bayes drops OOV tokens; vocab-less docs are excluded") {
    import spark.implicits._
    val train = Seq((1L, "a", "x y"), (2L, "b", "y z")).toDF("id", "label", "text")
    val test = Seq((10L, "x q q q"), (11L, "q w")).toDF("id", "text")
    val out = Classify.naiveBayes(train, test, "id", "text", "label").collect()
    // doc 11 has no in-vocab token -> no prediction; doc 10 scores only 'x'
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(10L))
    assert(out(0).getAs[String]("pred") == "a")
  }

  test("shingles: window expansion and short-doc guard") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "x"), (3L, "p q")).toDF("id", "text")
    val got = df.select($"id", TextOps.shinglesCol($"text", 2).as("sh"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a_b", "b_c", "c_d"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq("p_q"))
    val tri = df.select(TextOps.shinglesCol($"text", 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    assert(tri.map(_.toList).toSet == Set(List("a_b_c", "b_c_d"), Nil))
  }

  test("shingleStats counts across docs") {
    import spark.implicits._
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("id", "text")
    val got = TextOps.shingleStats(df, "id", "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a_b" -> 3L, "b_a" -> 1L))
  }
}
