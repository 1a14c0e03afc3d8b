package graft

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig, Manifest}
import graft.search.{IndexSearcher, Query}

/** Driver-contract and robustness edges: the oracle_sql.json handshake
  * shape (the round-1 dark-gate bug class), entry/oracle key alignment,
  * and degenerate-input behavior.
  */
class ContractSpec extends SparkTestBase {

  test("oracle JSON: dual keys for every oracle; strict escaping; parses") {
    val json = Verify.oracleJson
    // dual-key emit: the driver looks up "<name>.parquet", entries key bare
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(json.contains("\"" + k + "\":"), s"missing bare key $k")
      assert(json.contains("\"" + k + ".parquet\":"), s"missing filename key $k")
    }
    // no raw control characters survive (json.load poison)
    assert(!json.exists(c => c < ' '), "unescaped control char in oracle JSON")
    // structurally parseable by a strict scanner: balanced braces + quotes
    assert(json.startsWith("{") && json.endsWith("}"))
    var quotes = 0
    var i = 0
    while (i < json.length) {
      val c = json.charAt(i)
      if (c == '\\') i += 1
      else if (c == '"') quotes += 1
      i += 1
    }
    assert(quotes % 2 == 0, "unbalanced quotes")
  }

  test("every oracle key has a queries entry (driver compares by key)") {
    val qs = SparkEntry.queries.keySet
    val orphan = SparkEntry.oracleSql.keySet -- qs
    assert(orphan.isEmpty, s"oracle SQL without a queries entry: $orphan")
  }

  test("empty corpus: build commits an empty segment; search degrades sanely") {
    import spark.implicits._
    val dir = tmpDir("empty-seg")
    val m = IndexBuilder.buildSegment(
      spark.emptyDataset[(String, String)], dir,
      IndexConfig(bucketShift = 8, numPostingPartitions = 2, numDocPartitions = 1))
    assert(m.docCount == 0 && m.maxDocId == -1 && m.blockCount == 0)
    val se = new IndexSearcher(spark, Seq(Manifest.read(dir).get))
    assert(se.topK(Query.parse("anything"), 10).collect().isEmpty)
    assert(se.count(Query.parse("a OR b")) == 0)
    assert(se.expandPrefix("x").isEmpty)
    // the auditor reports the anomaly instead of crashing
    val report = graft.index.CheckIndex.check(spark, dir)
    assert(report.violations.contains("segment has zero docs"))
  }

  test("single-doc corpus: ranks and stats are sane at the smallest scale") {
    import spark.implicits._
    val dir = tmpDir("one-seg")
    IndexBuilder.buildSegment(
      Seq(("u1", "hello tiny world hello")).toDS(), dir,
      IndexConfig(bucketShift = 8, numPostingPartitions = 2, numDocPartitions = 1))
    val se = new IndexSearcher(spark, Seq(Manifest.read(dir).get))
    assert(se.stats.docCount == 1 && se.stats.sumTotalTermFreq == 4)
    val hits = se.topK(Query.parse("hello"), 5).collect()
    assert(hits.length == 1 && hits.head.docId == 0L && hits.head.score > 0)
    assert(se.count(Query.parse("absent")) == 0)
  }
}
