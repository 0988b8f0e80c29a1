package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-centrality scoring over relational edge tables — the
  * PageRank-family quality signal corpus curation uses when "how
  * CONNECTED is this document?" matters: within a near-dup cluster the
  * most central variant is the canonical one (an alternative to q107's
  * external-quality keep-best), and at web scale the same iteration
  * over a hyperlink/citation graph is the classic crawl-quality prior
  * (Page et al. 1999; Common Crawl ranks hosts by the harmonic variant).
  *
  * The iteration is pinned in EXACT integer arithmetic so a DuckDB
  * oracle replays it bit-for-bit (the q124/q139 "pin the training loop
  * itself" discipline): ranks are ×10⁶ BIGINTs, each round is
  *   r′(i) = base + (damp · Σ_{u→i} (r(u) div deg(u))) div 100,
  * base = (scale·(100−damp)) div 100 — positive-operand floor division
  * only, a per-edge truncation loss ≤ deg·10⁻⁶ that both engines lose
  * identically. Dangling/isolated nodes simply receive no shares (the
  * SQL LEFT JOIN semantics, same on both sides).
  *
  * Scale: the textbook distributed PageRank — per round one node-grain
  * join (rank ÷ degree) and one edge-grain shuffle (group incoming
  * shares by destination); cost ∝ |E| per round, state ∝ |V|. The
  * symmetrized edge list and degree table are staged once and reused
  * across rounds. Hot destinations (celebrity nodes) are an AQE
  * skew-join case, same as the CC loop; for rounds ≫ 3 persist the
  * rank table per round and checkpoint like [[Dedup.duplicateClusters]]
  * — at 3 rounds the lazy plan stays shallow and whole-stage codegen
  * spans each round.
  */
object Centrality {

  /** Quantized PageRank after `rounds` iterations over the UNDIRECTED
    * graph given by `edges` (one row per pair; symmetrized internally).
    * Every node in `nodes` gets a rank — members of no edge settle at
    * `base` after the first round. Output: (node, rank_q ×10⁻⁶·scale). */
  def pageRankQuantized(nodes: DataFrame, edges: DataFrame,
                        nodeCol: String, srcCol: String, dstCol: String,
                        rounds: Int = 3, damp: Int = 85,
                        scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    require(damp >= 0 && damp <= 100, s"damp must be a percentage: $damp")
    require(scale > 0, s"scale must be positive: $scale")
    val base = (scale * (100 - damp)) / 100
    // stage the PAIR list before symmetrizing: the union's two branches
    // would otherwise each evaluate the upstream edge producer (a near-dup
    // pair join is corpus-grain work) — measured 2× the whole pair cost
    // at sf0.1 before this split
    val pair = Staged.stage(
      edges.select(col(srcCol).as("u"), col(dstCol).as("v")))
    val dir = Staged.stage(
      pair.union(pair.select(col("v").as("u"), col("u").as("v"))))
    val deg = Staged.stage(dir.groupBy("u").agg(count(lit(1)).as("deg")))
    val ns = nodes.select(col(nodeCol).as("node"))
    var ranks = ns.select(col("node"), lit(scale).as("r"))
    for (_ <- 1 to rounds) {
      val shares = ranks.join(deg, ranks("node") === deg("u"))
        .select(col("u"), expr("r div deg").as("s"))
      val inc = dir.join(shares, Seq("u"))
        .groupBy(col("v").as("node")).agg(sum("s").as("inc"))
      ranks = ns.join(inc, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($damp * coalesce(inc, 0L)) div 100")).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_q"))
  }
}
