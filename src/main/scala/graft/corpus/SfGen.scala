package graft.corpus

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Deterministic synthetic-testdata generator matching the driver testdata's
  * schemas and distribution families (TESTDATA.md tables), for scale factors
  * the driver does not ship — the sf1.0 oracle sweep and scaling tables run
  * on its output. Every value is a pure function of (table, row id, seed)
  * via splitmix64, so the output is partitioning-independent, rerun-stable,
  * and identical across cluster sizes. No external data (north rule: the
  * input table is synthesised deterministically).
  *
  * Usage: runMain graft.corpus.SfGen <outDir> <sfTimes10>   (sf1.0 -> 10)
  */
object SfGen {

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-row RNG stream: draw k-th variate of row `id` in table `tbl`. */
  private def rng(tbl: Int, id: Long, k: Int): Long =
    mix(id * 1000003L + tbl * 0x51_7c_c1_b7L + k) & Long.MaxValue

  private def uniform(tbl: Int, id: Long, k: Int): Double =
    rng(tbl, id, k).toDouble / Long.MaxValue.toDouble

  // the driver corpus's 31-word vocabulary ('dup' is the mutation marker)
  private val Vocab = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")

  private def baseTokens(id: Long): Array[String] = {
    val len = 10 + (rng(1, id, 0) % 91).toInt
    Array.tabulate(len)(i => Vocab((rng(1, id, 10 + i) % Vocab.length).toInt))
  }

  /** Doc text: ~5% of docs are near-copies of an earlier doc with ~8% of
    * tokens replaced by the 'dup' marker — the planted near-duplicate
    * structure the dedup entries exercise (J ≈ 0.7-0.9 vs the source).
    */
  private def docText(id: Long): String = {
    val isDup = id > 0 && rng(1, id, 1) % 100 < 5
    if (!isDup) baseTokens(id).mkString(" ")
    else {
      val src = rng(1, id, 2) % id
      val toks = baseTokens(src)
      val out = toks.clone()
      var i = 0
      while (i < out.length) {
        if (rng(1, id, 1000 + i) % 100 < 8) out(i) = "dup"
        i += 1
      }
      out.mkString(" ")
    }
  }

  private val Langs = Array("en", "en", "en", "de", "es", "fr", "zh")
  private val EventTypes = Array("view", "click", "purchase", "signup", "error")
  private val Segments = Array("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Priorities = Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PartAdj = Array("large", "hot", "cold", "small", "shiny", "dark", "pale", "smooth")
  private val PartNoun = Array("ring", "bolt", "screw", "wheel", "plate", "gear", "pin", "cap")
  private val PartType = Array("LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO")

  private def round2(v: Double): Double = math.round(v * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft-sf1.0")
    val sf10 = args.lift(1).map(_.toInt).getOrElse(10) // 10 = sf1.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = 5000L * sf10
    val nVecs = 2000L * sf10
    val nEvents = 100000L * sf10
    val nCust = 15000L * sf10
    val nSupp = 1000L * sf10
    val nPart = 20000L * sf10
    val nOrders = 150000L * sf10
    val nLines = 600000L * sf10

    def range(n: Long, parts: Int) =
      spark.range(0, n, 1, parts)

    range(nDocs, 32).map { id =>
      val text = docText(id)
      (id, text, Langs((rng(1, id, 3) % Langs.length).toInt),
        s"src${rng(1, id, 4) % 20}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

    range(nVecs, 16).map { id =>
      // 64-dim unit vector: Box-Muller gaussians from the id's rng stream
      val g = new Array[Float](64)
      var i = 0
      var norm = 0.0
      while (i < 64) {
        val u1 = math.max(uniform(2, id, 2 * i), 1e-12)
        val u2 = uniform(2, id, 2 * i + 1)
        val v = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
        g(i) = v.toFloat
        norm += v * v
        i += 1
      }
      val inv = (1.0 / math.sqrt(norm)).toFloat
      (id, g.map(_ * inv), (rng(2, id, 200) % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val spanMs = 30L * 24 * 3600 * 1000
    range(nEvents, 32).map { id =>
      val ts = new java.sql.Timestamp(
        t0 + id * (spanMs / nEvents) + rng(3, id, 0) % (spanMs / nEvents))
      (id, ts, rng(3, id, 1) % nCust / 10,
        EventTypes((rng(3, id, 2) % EventTypes.length).toInt),
        round2(uniform(3, id, 3) * 200.0), s"""{"k": ${rng(3, id, 4) % 100}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")

    range(nCust, 8).map { id =>
      (id, f"Customer#$id%09d", (rng(4, id, 0) % 25).toInt,
        round2(uniform(4, id, 1) * 10000.0),
        Segments((rng(4, id, 2) % Segments.length).toInt))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/customer.parquet")

    range(nSupp, 4).map { id =>
      (id, f"Supplier#$id%09d", (rng(5, id, 0) % 25).toInt,
        round2(uniform(5, id, 1) * 10000.0))
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/supplier.parquet")

    range(nPart, 8).map { id =>
      (id, PartAdj((rng(6, id, 0) % 8).toInt) + " " + PartNoun((rng(6, id, 1) % 8).toInt),
        s"Brand#${rng(6, id, 2) % 25}", PartType((rng(6, id, 3) % 6).toInt),
        (1 + rng(6, id, 4) % 50).toInt, round2(900.0 + (id % 1000) * 0.1))
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/part.parquet")

    val day = 24L * 3600 * 1000
    val d95 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00").getTime
    range(nOrders, 16).map { id =>
      (id, rng(7, id, 0) % nCust, "OPF".charAt((rng(7, id, 1) % 3).toInt).toString,
        round2(1000.0 + uniform(7, id, 2) * 499000.0),
        new java.sql.Timestamp(d95 + (rng(7, id, 3) % 2400) * day),
        Priorities((rng(7, id, 4) % 5).toInt))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/orders.parquet")

    range(nLines, 32).map { id =>
      (id / 4, rng(8, id, 0) % nPart, rng(8, id, 1) % nSupp,
        (id % 4 + 1).toInt, (1 + rng(8, id, 2) % 50).toDouble,
        round2(900.0 + uniform(8, id, 3) * 104100.0),
        (rng(8, id, 4) % 11).toDouble / 100.0, (rng(8, id, 5) % 9).toDouble / 100.0,
        "RAN".charAt((rng(8, id, 6) % 3).toInt).toString,
        "OF".charAt((rng(8, id, 7) % 2).toInt).toString,
        new java.sql.Timestamp(d95 + (rng(8, id, 8) % 2500) * day))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/lineitem.parquet")

    (0 until 25).map(i => (i.toLong, s"NATION_$i", (i % 5).toLong))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/nation.parquet")
    Seq((0L, "AFRICA"), (1L, "AMERICA"), (2L, "ASIA"), (3L, "EUROPE"), (4L, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$outDir/region.parquet")

    println(s"[sfgen] wrote sf${sf10 / 10.0} tables to $outDir " +
      s"(docs=$nDocs vecs=$nVecs lineitem=$nLines)")
    spark.stop()
  }
}
