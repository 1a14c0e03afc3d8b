package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Public-Suffix-List registrable domains — the correct grouping key for
  * per-domain crawl statistics and rate caps (`site.co.uk` must group as
  * `site.co.uk`, never collapse into `co.uk` with every other UK company).
  *
  * Rules load from a checked-in snapshot subset of the publicly documented
  * list (`graft/psl-snapshot.dat`, publicsuffix.org format: plain rules,
  * `*.` wildcards, `!` exceptions, `//` comments) — swapping in the full
  * published file changes nothing in this code path.
  *
  * Matching algebra (the published algorithm): a host's prevailing rule is
  * the matching EXCEPTION rule if any, else the longest matching rule, else
  * the implicit default `*` (public suffix = the last label). The public
  * suffix spans the rule's label count (exception rules: one less); the
  * registrable domain is the public suffix plus one more label.
  *
  * Execution shape at 100 TB: the rule table (KBs) broadcasts; each DISTINCT
  * host explodes into its ≤ 2×6 candidate suffix strings (exact k-suffix
  * and `*.`-form), broadcast-joins the rules, and a per-host max picks the
  * prevailing rule — one narrow explode + broadcast join + hash agg over
  * the HOST DIMENSION (≪ corpus), then callers hash-join the (host, domain)
  * map back (AQE broadcasts it while the crawl's host set is small).
  */
object PublicSuffix {

  /** (rule text as matched, label count incl. `*`, kind 0=normal 1=wildcard
    * 2=exception) from the snapshot.
    */
  lazy val rules: Seq[(String, Int, Int)] = {
    val in = getClass.getResourceAsStream("/graft/psl-snapshot.dat")
    require(in != null, "psl-snapshot.dat resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .map { l =>
          val kind = if (l.startsWith("!")) 2 else if (l.startsWith("*.")) 1 else 0
          val text = if (kind == 2) l.substring(1) else l
          (text, text.count(_ == '.') + 1, kind)
        }
        .toVector
    } finally src.close()
  }

  /** Longest rule's label count — bounds candidate generation. */
  lazy val maxRuleLabels: Int = rules.map(_._2).max

  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rules.toDF("rule", "rlabels", "kind")
  }

  /** (host, domain) map for the distinct hosts of `hosts(hostCol)` —
    * domain = PSL registrable domain; a host that IS a public suffix (or
    * shorter) maps to itself, so crawl rollups never drop rows.
    */
  def registrableDomainTable(hosts: DataFrame, hostCol: String = "host"): DataFrame = {
    val spark = hosts.sparkSession
    val h = hosts.select(col(hostCol).as("host"))
      .where(col("host").isNotNull && col("host") =!= "")
      .distinct()
    val labeled = h
      .withColumn("__ls", split(col("host"), "\\."))
      .withColumn("__n", size(col("__ls")))
    val kMax = lit(maxRuleLabels)
    // candidate rule texts: the exact k-label suffix and its wildcard form
    // (leftmost label replaced by `*`) for k = 1..min(n, maxRuleLabels)
    val cands = labeled.withColumn("__cand", explode(flatten(transform(
      sequence(lit(1), least(col("__n"), kMax)),
      k => array(
        array_join(slice(col("__ls"), -k, k), "."),
        when(k > 1, concat(lit("*."),
          array_join(slice(col("__ls"), (k - 1) * -1, k - 1), ".")))
          .otherwise(lit(null)))))))
      .where(col("__cand").isNotNull)
    val matched = cands
      .join(broadcast(rulesDf(spark)), col("__cand") === col("rule"))
      .groupBy(col("host"))
      // prevailing rule: exception beats all, else longest (struct compares
      // field-by-field)
      .agg(max(struct((col("kind") === 2).as("exc"), col("rlabels").as("rl")))
        .as("__w"))
    labeled.join(matched, Seq("host"), "left")
      .withColumn("__ps",
        when(col("__w").isNull, lit(1)) // implicit default rule `*`
          .when(col("__w.exc"), col("__w.rl") - 1)
          .otherwise(col("__w.rl")))
      .withColumn("domain",
        when(col("__n") > col("__ps"),
          array_join(slice(col("__ls"), (col("__ps") + 1) * -1, col("__ps") + 1), "."))
          .otherwise(col("host")))
      .select(col("host"), col("domain"))
  }

  /** Adds `outCol` = PSL registrable domain of `hostCol` via the host-dim
    * map join (see [[registrableDomainTable]]).
    */
  def withRegistrableDomain(df: DataFrame, hostCol: String,
                            outCol: String = "domain"): DataFrame = {
    val dmap = registrableDomainTable(df.select(col(hostCol)), hostCol)
      .withColumnRenamed("host", "__psl_host")
      .withColumnRenamed("domain", outCol)
    df.join(dmap, df(hostCol) === col("__psl_host"), "left")
      .drop("__psl_host")
  }
}
