package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared customer–supplier bipartite edge spine for the graph query
  * family (q_pagerank, q_label_prop, q_shortest_path, q_bfs_layers,
  * q_kcore, q_katz).
  *
  * r19 optimization (guide §2.4, remove shuffles outright): the build
  * rounds' spine paid THREE edge-sized exchanges —
  * `distinct` on the (c, p) pairs, a second `distinct` over the
  * symmetrized union, and a `repartition(src)` — 4 Exchange ops in the
  * physical plan (ReusedExchange included). But the second distinct is
  * set-theoretically redundant given the first (c is always even, p
  * always odd, so the two union orientations cannot collide), and the
  * dedup can run AFTER the src repartition with no exchange of its own:
  * HashPartitioning(src) satisfies the ClusteredDistribution(src, dst)
  * the dedup aggregate requires (partition keys ⊆ grouping keys). So
  * the spine now unions both orientations of the RAW join output,
  * repartitions ONCE by src (the layout every iterative kernel needs
  * for its per-round co-located join), and dedups within partitions:
  * 4 Exchange → 1 Exchange (plans/r19/graph_spine_{old,new}.txt),
  * measured 1.9 s → 1.2 s warm at sf0.1/local[32] for the fragment.
  * The edge SET is unchanged (dedup by (src, dst) commutes with the
  * orientation union), so every downstream kernel's result is
  * bit-identical — re-verified against the DuckDB oracle this round.
  */
private[graft] object GraphSpine {

  /** Symmetrized, deduped (src, dst) edge frame, hash-partitioned by
    * src. NOT persisted — callers persist per their loop's contract. */
  def csEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val cp = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
    cp.select(col("c").as("src"), col("p").as("dst"))
      .unionByName(cp.select(col("p").as("src"), col("c").as("dst")))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
  }
}
