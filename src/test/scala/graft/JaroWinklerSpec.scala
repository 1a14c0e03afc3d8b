package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler
import graft.index.{IndexBuilder, IndexConfig, Manifest}
import graft.search.IndexSearcher

/** Jaro–Winkler similarity (ref `suggest/spell/JaroWinklerDistance.java`):
  * classic fixtures, the reference's two quirks (uncapped prefix,
  * min(0.1, 1/maxLen) scaling), codegen==driver identity, and the
  * spell-ranking path against a driver-computed expectation.
  */
class JaroWinklerSpec extends SparkTestBase {

  private def jw(a: String, b: String): Double = JaroWinkler.similarity(a, b)

  test("classic fixtures") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0) // no matches
  }

  test("boost threshold: no Winkler bonus below jaro 0.7") {
    // common prefix "aa" but jaro < 0.7 → the bonus must NOT apply
    val j = JaroWinkler.jaro("aabcde", "aazzzz")
    assert(j < 0.7)
    assert(jw("aabcde", "aazzzz") == j)
  }

  test("reference quirks: uncapped prefix and 1/maxLen scaling") {
    // 12-char strings, common prefix 11 (a cap-4 variant would score lower),
    // scale = min(0.1, 1/12) = 1/12 (a fixed-0.1 variant would score higher)
    val a = "aaaaaaaaaaab"; val b = "aaaaaaaaaaac"
    val j = JaroWinkler.jaro(a, b)
    val want = j + (1.0 / 12) * 11 * (1 - j)
    assert(math.abs(jw(a, b) - want) < 1e-12)
    val cap4 = j + (1.0 / 12) * 4 * (1 - j)
    val fixed = j + 0.1 * 11 * (1 - j)
    assert(jw(a, b) != cap4 && jw(a, b) != fixed)
  }

  test("column expression == driver function (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def word() = (0 until 1 + rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val pairs = Seq.fill(2000)((word(), word()))
    val got = pairs.toDF("a", "b")
      .select(JaroWinkler.jaroWinkler($"a", $"b"))
      .as[Double].collect()
    pairs.zip(got).foreach { case ((a, b), g) =>
      assert(g == jw(a, b), s"($a, $b): col=$g driver=${jw(a, b)}")
    }
  }

  test("spellCorrectJaro ranks by (similarity desc, docFreq desc, term)") {
    import spark.implicits._
    val dir = tmpDir("jaro")
    val docs = Seq(
      "u01" -> "query engine", "u02" -> "query planner", "u03" -> "quartz",
      "u04" -> "queue depth", "u05" -> "quarry stone", "u06" -> "query cache")
    IndexBuilder.buildSegment(spark.createDataset(docs), s"$dir/seg",
      IndexConfig(bucketShift = 4, numPostingPartitions = 2, numDocPartitions = 1))
    val se = new IndexSearcher(spark, Seq(Manifest.read(s"$dir/seg").get))
    val got = se.spellCorrectJaro("qurey", n = 5)
      .as[(String, Double, Long)].collect().toSeq
    // driver expectation over the full vocabulary
    val vocab = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (t, os) =>
        val df = docs.count(_._2.split(" ").contains(t)).toLong
        (t, BigDecimal(jw("qurey", t)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, df)
      }
      .filter { case (t, s, _) => s >= 0.7 && t != "qurey" }
      .toSeq.sortBy { case (t, s, df) => (-s, -df, t) }.take(5)
    assert(got == vocab, s"got=$got want=$vocab")
    assert(got.head._1 == "query")
  }
}
