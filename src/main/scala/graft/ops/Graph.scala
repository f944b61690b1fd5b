package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph statistics over an undirected edge list — the
  * structure census of a similarity graph (NOT-IN-REFERENCE extension;
  * kinship: `Dedup.connectedComponents` labels the components, this
  * measures their internal shape). A near-dup graph whose nodes have high
  * clustering coefficients is clique-like (true duplicate groups); low
  * coefficients flag chain-shaped false-positive bridges that connected
  * components would happily glue into one giant cluster.
  *
  * Everything is exact integer arithmetic over joins: triangles enumerate
  * once each via the canonical a < b < c orientation (the standard
  * relational triangle listing), per-node counts explode the three
  * corners, and the local clustering coefficient is the single division
  * `2·t / (d·(d−1))`. Plan: the edge list is the near-dup PAIR stream —
  * bounded by the dedup machinery upstream, not corpus-sized; two
  * self-joins keyed by node id, every aggregate map-side combined. */
object Graph {

  /** Per-node `(id, degree, triangles, clustering)` ordered by id, over
    * the undirected simple graph of `edges` (duplicates and self-loops
    * drop; orientation is normalized). Nodes with degree < 2 have
    * clustering 0.0 by convention. */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      // pin the deduped edge list: referenced 3-5x below (sym both arms,
      // adjacency sides, iteration/final joins), and the upstream is the
      // expensive minhash candidate pipeline — edge-count-sized storage
      .localCheckpoint()
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("degree"))
    // canonical triangles: (x<y), (y<z), (x<z) all edges — each listed once
    val e1 = e.select(col("a").as("x"), col("b").as("y"))
    val e2 = e.select(col("a").as("y"), col("b").as("z"))
    val e3 = e.select(col("a").as("x"), col("b").as("z"))
    val tris = e1.join(e2, "y").join(e3, Seq("x", "z"))
      .select(col("x"), col("y"), col("z"))
    val corner = tris.select(col("x").as("id"))
      .unionAll(tris.select(col("y").as("id")))
      .unionAll(tris.select(col("z").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    deg.join(corner, Seq("id"), "left")
      .withColumn("triangles", coalesce(col("triangles"), lit(0L)))
      .withColumn("clustering",
        when(col("degree") >= 2L,
          round(lit(2.0) * col("triangles").cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double"), 6))
          .otherwise(lit(0.0)))
      .select(col("id"), col("degree"), col("triangles"), col("clustering"))
      .orderBy(col("id"))
  }

  /** Per-EDGE neighborhood Jaccard — the link-strength census of a
    * similarity graph (the edge-level sibling of [[triangleStats]]'s
    * node-level clustering): for each edge (a, b), how much of their
    * neighborhoods overlap, `|N(a)∩N(b)| / |N(a)∪N(b)|` with the
    * endpoints themselves excluded. High Jaccard edges sit inside
    * cliques (true duplicate groups); Jaccard-0 edges are the
    * false-positive BRIDGES that chain unrelated clusters together —
    * the exact edges to cut before collapsing components.
    *
    * Exact integer arithmetic over joins: common neighbors enumerate as
    * wedges (one adjacency join per endpoint, Σdeg² bounded — the
    * standard triangle-listing cost), and the Jaccard is the single
    * division `c / ((da−1) + (db−1) − c)`. The edge list is the bounded
    * near-dup pair stream, never corpus-sized.
    *
    * Returns `(a, b, deg_a, deg_b, common, jaccard)` ordered by (a, b);
    * NULL jaccard only when both endpoints are degree-1 (empty union). */
  def edgeJaccard(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      // pin the deduped edge list: referenced 3-5x below (sym both arms,
      // adjacency sides, iteration/final joins), and the upstream is the
      // expensive minhash candidate pipeline — edge-count-sized storage
      .localCheckpoint()
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("degree"))
    val n1 = sym.select(col("a").as("ea"), col("b").as("n"))
    val n2 = sym.select(col("a").as("eb"), col("b").as("n"))
    val common = e
      .join(n1, col("a") === col("ea"))
      .join(n2, col("b") === col("eb") && n1("n") === n2("n"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    val denom = (col("deg_a") - lit(1L)) + (col("deg_b") - lit(1L)) -
      col("common")
    e.join(deg.select(col("id").as("a"), col("degree").as("deg_a")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("degree").as("deg_b")), Seq("b"))
      .join(common, Seq("a", "b"), "left")
      .withColumn("common", coalesce(col("common"), lit(0L)))
      .select(col("a"), col("b"), col("deg_a"), col("deg_b"), col("common"),
        when(denom > 0L,
          round(col("common").cast("double") / denom.cast("double"), 6))
          .as("jaccard"))
      .orderBy(col("a"), col("b"))
  }

  /** Deterministic integer PageRank over the undirected simple graph of
    * `edges` (duplicates/self-loops drop) — centrality for the near-dup
    * pair graph: the highest-ranked node of a component is its natural
    * canonical representative, and rank mass concentrating on one hub
    * flags a mega-cluster worth auditing before collapsing it.
    *
    * Ranks live in MICRO-RANK units (the uniform start mass is 1e6 per
    * node) and every step is LONG floor arithmetic:
    * `r' = (den−num)·1e6 DIV den + (num · Σ_in (r DIV deg)) DIV den`
    * with damping `num/den` (default 85/100). Integer sums are
    * order-independent, so the result is bit-identical on any engine,
    * any partitioning, any summation order — the FP-association problem
    * of floating PageRank never arises, and a relational replay
    * hash-matches. The floor truncation leaks ≤1 micro-rank per edge per
    * iteration (documented contract, not an approximation knob).
    *
    * Each of the fixed `iters` power iterations is one broadcast-or-
    * shuffle join (ranks are node-sized, edges are the bounded pair
    * stream) plus one map-side-combined aggregate; no dangling terms
    * because every node of an edge list has degree ≥ 1.
    *
    * Returns `(id, deg, rank_micro, rank)` ordered by id. */
  def pageRank(edges: DataFrame, aCol: String, bCol: String, iters: Int = 3,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"iters must be in [1,16], got $iters")
    require(dampNum > 0 && dampDen > dampNum,
      s"damping must satisfy 0 < num < den, got $dampNum/$dampDen")
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
      // pin the deduped edge list: referenced 3-5x below (sym both arms,
      // adjacency sides, iteration/final joins), and the upstream is the
      // expensive minhash candidate pipeline — edge-count-sized storage
      .localCheckpoint()
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .select(col("a").as("src"), col("b").as("dst"))
    val deg = sym.groupBy(col("src").as("nid")).agg(count(lit(1)).as("deg"))
    // (src, dst, deg(src)) computed once; iterations only re-join ranks
    val edgesDeg = sym.join(deg, sym("src") === deg("nid"))
      .select(col("src"), col("dst"), col("deg"))
    val baseMicro = (dampDen - dampNum) * 1000000L / dampDen
    var ranks = deg.select(col("nid").as("id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edgesDeg.join(ranks, edgesDeg("src") === ranks("id"))
        .select(col("dst"), expr("r DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      ranks = contrib.select(col("dst").as("id"),
        (lit(baseMicro) +
          expr(s"(${dampNum}L * cs) DIV ${dampDen}L")).as("r"))
    }
    deg.join(ranks, deg("nid") === ranks("id"))
      .select(col("id"), col("deg"), col("r").as("rank_micro"),
        (col("r").cast("double") / lit(1000000.0)).as("rank"))
      .orderBy(col("id"))
  }
}
