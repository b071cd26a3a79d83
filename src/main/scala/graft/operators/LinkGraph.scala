package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl link graph: host-level edges out of page HTML and a
  * fixed-iteration PageRank over them — the frontier-prioritization /
  * quality-weighting step of large crawl curations (Common-Crawl-style
  * host ranking; the C4/RefinedWeb lineage weights domains by link
  * centrality before sampling). No reference counterpart (its formats
  * are scientific); the shapes here are the standard ones.
  *
  * Scale: edge extraction is a map-only pass over pages followed by
  * ONE (src, dst) shuffle; PageRank costs two broadcast-free joins +
  * one aggregation per iteration, all partitioned by host key. Node
  * and degree tables derive once and re-join each round. Host keys
  * are low-cardinality relative to pages (the 100 TB corpus has ~10⁷
  * hosts, not 10¹¹), so the per-iteration shuffle is small; skewed
  * mega-hosts (wikipedia.org) concentrate on the DST side of the
  * contribution aggregation, which is a partial-aggregated groupBy —
  * map-side combine absorbs the skew before it ships.
  */
object LinkGraph {

  /** Host-level edge list from pages: `(src_host, dst_host, n_links)`
    * where links come from [[TextOps.htmlLinks]] over `htmlCol`
    * resolved against `urlCol`. Self-edges (intra-host navigation —
    * the overwhelming bulk of a real page's links) are excluded;
    * `n_links` counts repeated cross-host links page-by-page. */
  def hostEdges(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val src = TextOps.urlHost(col(urlCol))
    pages
      .select(src.as("src_host"),
        explode(TextOps.htmlLinks(col(htmlCol), col(urlCol))).as("dst"))
      .select(col("src_host"), TextOps.urlHost(col("dst")).as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "" &&
        col("src_host") =!= col("dst_host"))
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))
  }

  /** Fixed-iteration PageRank over a directed edge list. Classic
    * power iteration on the UNWEIGHTED simple digraph (parallel edges
    * collapse): every node starts at 1/N; each round a node keeps
    * `(1-d)/N` and receives `d · Σ rank(src)/out_deg(src)` over its
    * in-edges. Dangling nodes (no out-edges) leak their damped mass —
    * the simple convention, stated here because it is part of the
    * replayable contract; ranks then sum to < 1 in graphs with sinks.
    *
    * Determinism across engines: every iteration rounds to 9 decimals
    * so floating summation order cannot accumulate drift between this
    * plan and a SQL replay of the same rounds.
    *
    * N rides as a one-row aggregate frame broadcast into the plan (no
    * driver-side count action); the iteration chain is pure plan —
    * callers iterating far past the default on huge graphs should
    * checkpoint every few rounds to bound lineage. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val nNodes = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(nNodes))
      .select(col("node"), round(lit(1.0) / col("n_nodes"), 9).as("rank"))
    var i = 0
    while (i < iterations) {
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(outDeg, "src")
        .select(col("dst"), (col("rank") / col("out_deg")).as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("mass"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .crossJoin(broadcast(nNodes))
        .select(col("node"),
          round(lit(1.0 - damping) / col("n_nodes") +
            lit(damping) * coalesce(col("mass"), lit(0.0)), 9).as("rank"))
      i += 1
    }
    ranks
  }
}
