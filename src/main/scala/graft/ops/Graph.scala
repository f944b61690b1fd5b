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
}
