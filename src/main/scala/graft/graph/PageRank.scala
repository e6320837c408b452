package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank by power iteration over a `(src, dst, weight)`
  * edge table — the domain-level quality prior a crawl-curation
  * pipeline computes over its link graph (cf. Common Crawl's
  * domain-rank releases built on the Page et al. 1999 formulation).
  *
  * Scale shape: the caller aggregates raw per-document links down to
  * the weighted domain graph first (that groupBy is the one stage
  * proportional to corpus size, and it map-side combines). Each
  * iteration here is then a join + partial-aggregable groupBy on the
  * REDUCED graph: rank mass flows `src -> dst` along out-degree-
  * normalized weights. Nothing is ever collected to the driver except
  * the node count (one scalar). Lineage is cut per iteration with
  * `localCheckpoint` exactly like the connected-components loop
  * ([[graft.text.Dedup]]) — without it the plan doubles per round.
  *
  * Dangling nodes (no out-edges) are legal: their mass exits the
  * system, matching the "taxation-only" variant; nodes that never
  * appear as a `dst` still receive the `(1-d)/n` floor via the
  * left join + coalesce.
  */
object PageRank {

  /** `(node, pr)` after `iters` damped iterations from the uniform
    * start. Edge weights must be positive; `damping` in [0,1]. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double,
      checkpoint: Boolean = true): DataFrame = {
    require(iters >= 0 && damping >= 0.0 && damping <= 1.0)
    val outW = edges.groupBy(col("src")).agg(sum(col("weight")).as("_ow"))
    val probs = edges.join(outW, "src")
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("_ow")).as("_p"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val n = nodes.count()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = probs.join(ranks, probs("src") === ranks("node"))
        .groupBy(col("dst")).agg(sum(col("_p") * col("pr")).as("_in"))
      val next = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n)
            + lit(damping) * coalesce(col("_in"), lit(0.0))).as("pr"))
      ranks = if (checkpoint) next.localCheckpoint() else next
    }
    ranks
  }
}
