package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics beyond connected components: PageRank in exact
  * integer arithmetic, so a fixed-iteration run replays value-for-value
  * in DuckDB (unrolled CTEs) — the q26 discipline applied to the other
  * classic iterative graph workload.
  */
object GraphOps {

  /** Integer-exact PageRank: ranks start at 1e6 micro-units per node;
    * each iteration is `r' = 150000 + 85 * S div 100` with
    * `S = Σ_in (r div out_deg)` — damping 0.85 with every division a
    * truncating integer div, so any engine reproduces the exact
    * values (no FP summation order anywhere). Fixed `iters`
    * iterations, top-`k` by final rank.
    *
    * Scale shape: the edge list (with out-degree attached) is
    * materialized ONCE (eager localCheckpoint — it is consumed every
    * iteration, and per-iteration checkpoints keep the rank frame's
    * lineage bounded, the q26 lesson); each iteration is one
    * ranks⇄edges equi-join plus a map-side-combinable groupBy on dst.
    * Ranks are node-sized, edges edge-sized, nothing grows with
    * iteration count. Top-k is sort-limit, not a global window.
    *
    * Input: (src bigint, dst bigint) directed edges. Dangling nodes
    * (no out-edges) keep receiving the base term only — for an
    * undirected graph feed both directions, where none exist.
    */
  def pageRank(edges0: DataFrame, iters: Int = 5, k: Int = 20): DataFrame = {
    require(iters >= 1 && iters <= 20, "iterations in [1,20]")
    val edges = edges0.select(col("src").cast("bigint").as("src"),
      col("dst").cast("bigint").as("dst")).distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, Seq("src")).localCheckpoint(true)
    var ranks = edges.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      ranks = withDeg.join(ranks, withDeg("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          expr("CAST(150000 + 85 * s div 100 AS BIGINT)").as("r"))
        .localCheckpoint(true) // bounded lineage across iterations
    }
    ranks.orderBy(col("r").desc, col("node").asc).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("r").desc, col("node").asc)))
      .select(col("node"), col("r"), col("rank").cast("bigint").as("rank"))
  }
}
