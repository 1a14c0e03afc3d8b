package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.SmallFloat
import graft.index.Schema.CollectionStats
import graft.search.{Bm25, Bm25FloatScorer}

/** BM25 formula checks in the BaseSimilarityTestCase style (FIXTURES.md F4):
  * sweep every norm byte x corpus stats x boundary freqs; assert the exact
  * float formula chain of the reference
  * (`/root/reference/lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java:101-233`).
  */
class Bm25Spec extends AnyFunSuite {

  test("idf matches the float formula") {
    val cases = Seq((1L, 1L), (1L, 100L), (50L, 100L), (100L, 100L), (3L, 1000000L))
    for ((n, nn) <- cases) {
      val expected = math.log(1 + (nn - n + 0.5d) / (n + 0.5d)).toFloat
      assert(Bm25.idf(n, nn) == expected)
    }
  }

  test("full norm-byte sweep: exact float chain, finite, monotone") {
    val statsList = Seq(
      CollectionStats(10, 100),
      CollectionStats(1000, 250000),
      CollectionStats(1000000, 400000000L)
    )
    for (stats <- statsList; docFreq <- Seq(1L, stats.docCount / 2 + 1, stats.docCount)) {
      val idf = Bm25.idf(docFreq, stats.docCount)
      val avgdl = Bm25.avgFieldLength(stats)
      val scorer = new Bm25FloatScorer(1.2f, 0.75f, idf, avgdl)
      var prevNormScore = Float.MaxValue
      for (norm <- 0 until 256) {
        val len = SmallFloat.lengthTable(norm)
        for (freq <- Seq(1, 2, 17, 1000)) {
          // independent recomputation of the documented chain
          val cache = 1f / (1.2f * ((1 - 0.75f) + 0.75f * len / avgdl))
          val expected = idf - idf / (1f + freq * cache)
          val got = scorer.score(freq, norm)
          assert(got == expected.toDouble, s"norm=$norm freq=$freq")
          assert(!got.isNaN && !got.isInfinite)
          assert(got >= 0.0)
        }
        // longer doc (higher norm) scores <= shorter at same freq
        val s = scorer.score(7, norm).toFloat
        assert(s <= prevNormScore + 1e-9f || norm == 0)
        if (norm > 0) prevNormScore = s
      }
      // monotone in freq at fixed norm
      var prev = -1.0
      for (freq <- 1 to 50) {
        val s = scorer.score(freq, 150)
        assert(s >= prev)
        prev = s
      }
    }
  }

  test("norm byte encoding: exact small lengths, lossy-monotone above 39") {
    for (len <- 0 until 40)
      assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(len)) == len)
    assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(1000)) <= 1000)
  }
}
