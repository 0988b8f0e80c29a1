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
    val pair = Staged.stageCut(
      edges.select(col(srcCol).as("u"), col(dstCol).as("v")))
    val dir = Staged.stageCut(
      pair.union(pair.select(col("v").as("u"), col("u").as("v"))))
    val deg = Staged.stageCut(dir.groupBy("u").agg(count(lit(1)).as("deg")))
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

  /** Per-node triangle count and local clustering coefficient over the
    * undirected graph given by unique `(srcCol, dstCol)` pairs — the
    * dedup-graph HEALTH reading next to [[pageRankQuantized]]'s
    * quality reading: a near-dup neighborhood that closes into
    * triangles (closure → 10⁴) is clique-like template duplication the
    * cluster pass will safely collapse, while high degree with near-zero
    * closure is chain-like drift (A~B~C but A≁C) where transitive
    * clustering over-merges — the signal for tightening the threshold
    * before running [[Dedup.duplicateClusters]].
    *
    * The closure coefficient is emitted in exact basis points,
    * `(2·T·10⁴) div (deg·(deg−1))` — positive-operand floor division
    * both engines truncate identically; degree-1 nodes have no
    * possible wedge and emit NULL.
    *
    * Scale: the degree-ordered compact-forward algorithm (Latapy 2008;
    * the standard MapReduce triangle count). Each edge is oriented
    * from its lower-(degree, id) endpoint, so a hub of degree D fans
    * out wedges only among its HIGHER-ranked neighbors — per-edge
    * fan-out is bounded by graph arboricity (≈√|E| worst case), never
    * D², which is what makes a celebrity node survivable at 100 TB.
    * Wedges close via one equi-join against the oriented edge list;
    * each triangle materializes exactly once and explodes to its three
    * corners for the per-node count. The oriented edge list is staged
    * once and drives both sides of the wedge join and the closure
    * probe. */
  def triangleStats(pairs: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val p = Staged.stageCut(
      pairs.select(col(srcCol).as("a"), col(dstCol).as("b")))
    val deg = Staged.stageCut(
      p.select(col("a").as("node")).union(p.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree")))
    // orient each edge from the lower-(degree, id) endpoint; carry the
    // head's rank so the wedge join can order neighbors without
    // re-joining the degree table
    val withDeg = p
      .join(deg.select(col("node").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("degree").as("db")), Seq("b"))
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = Staged.stageCut(withDeg.select(
      when(aLower, col("a")).otherwise(col("b")).as("u"),
      when(aLower, col("b")).otherwise(col("a")).as("v"),
      when(aLower, col("db")).otherwise(col("da")).as("dv")))
    val e1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    // the closure edge between x and y is oriented x→v by construction
    // (rank(x) < rank(y)), so one equi-join probes it
    val tri = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
    val corners = tri.select(explode(array(col("u"), col("x"), col("y")))
      .as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("degree") >= 2,
          expr("(2 * coalesce(n_tri, 0L) * 10000L) div (degree * (degree - 1))"))
          .as("closure_bp"))
  }

  /** Newman modularity (Newman & Girvan 2004) of a GIVEN node
    * partition over an undirected edge set, in exact rational
    * arithmetic:
    *   Q = Σ_c (m_c/m − (D_c/2m)²) = Σ_c (4m·m_c − D_c²) / (4m²)
    * where m_c = intra-partition edges and D_c = endpoint count of
    * part c (every edge contributes one endpoint to each side's
    * part — no separate degree table is ever built). Emitted as one
    * row (n_edges, intra_edges, n_parts, q_bp) with q_bp the
    * ×10⁴ reading via sign-extracted positive-operand DIV (Q is
    * negative when a partition does WORSE than the degree-preserving
    * null model); NULL on an empty edge set. The numerator and
    * denominator ride DECIMAL(38,0)/HUGEINT — 4m² outgrows 64 bits
    * at ~1.5 B edges.
    *
    * The LLM-pipeline read (q198): partition = SOURCE, edges = the
    * near-dup pair graph. Q near 1 = duplication is source-INTERNAL
    * (dedup can shard per source — each source's pair join runs
    * independently, a 100 TB plan simplification); Q near 0 or
    * negative = copying crosses feeds and only GLOBAL dedup is
    * sound. The labeled edge table stages once and feeds m, m_c, and
    * both endpoint-count sides; label attachment is two equi-joins. */
  def modularity(edges: DataFrame, aCol: String, bCol: String,
                 labels: DataFrame, idCol: String, labelCol: String)
      : DataFrame = {
    val la = labels.select(col(idCol).as("__a"), col(labelCol).as("__ca"))
    val lb = labels.select(col(idCol).as("__b"), col(labelCol).as("__cb"))
    val le = Staged.stageCut(edges
      .select(col(aCol).as("__a"), col(bCol).as("__b"))
      .join(la, Seq("__a")).join(lb, Seq("__b"))
      .select("__ca", "__cb"))
    val m = le.agg(count(lit(1)).as("__m"))
    val mc = le.filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("__c")).agg(count(lit(1)).as("__mc"))
    val dc = le.select(col("__ca").as("__c"))
      .union(le.select(col("__cb").as("__c")))
      .groupBy("__c").agg(count(lit(1)).as("__d"))
    dc.join(mc, Seq("__c"), "left")
      .crossJoin(broadcast(m))
      .agg(count(lit(1)).as("n_parts"),
        sum(coalesce(col("__mc"), lit(0L))).as("intra_edges"),
        sum(lit(4).cast("decimal(38,0)") * col("__m") *
            coalesce(col("__mc"), lit(0L)) -
          col("__d").cast("decimal(38,0)") * col("__d")).as("__num"),
        max(col("__m")).as("n_edges"))
      .select(coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        col("n_parts"),
        expr("""CASE WHEN n_edges IS NULL OR n_edges = 0 THEN NULL
          WHEN __num >= 0 THEN
            CAST((__num * 10000) DIV (4 * cast(n_edges as decimal(38,0)) * n_edges) AS BIGINT)
          ELSE
            -CAST(((-__num) * 10000) DIV (4 * cast(n_edges as decimal(38,0)) * n_edges) AS BIGINT)
          END""").as("q_bp"))
  }
}
