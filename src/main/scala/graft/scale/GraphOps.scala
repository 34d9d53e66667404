package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph analytics over corpus-derived edge lists (the kNN
  * graph, near-dup candidate pairs) — the "what are the central /
  * representative documents" layer of corpus mining.
  *
  * Everything is expressed as joins + aggregations on (src, dst) edge
  * tables: at scale this is the standard Pregel-as-relational encoding —
  * partition edges by src once, shuffle the rank vector on the id each
  * superstep, nothing driver-side but scalars.
  */
object GraphOps {

  /** Fixed-iteration PageRank in FIXED-POINT integer arithmetic:
    * ranks are micro-units (init = `scale`), each superstep computes
    * pr ← (100−d)·scale/100 + (d · Σ_in (pr DIV deg)) DIV 100 with
    * integer division (d = `dampingPct`, default 85). Floating-point
    * summation is order-dependent, so a double-valued PageRank can
    * round differently between engines/runs on boundary values; integer
    * sums are exact and order-free, making the result bit-identical in
    * any engine — the property the oracle gate needs — at the cost of
    * ≤1 micro-unit truncation per term (irrelevant for ranking).
    * Dangling nodes leak their mass (the simple deterministic variant).
    *
    * One edges⋈rank shuffle + one aggregation per superstep; the
    * out-degree rides with the edge table, which is persisted ONCE so
    * an expensive upstream lineage (e.g. the kNN self-join) is not
    * recomputed per iteration. Overflow bound: N·scale·d must fit in
    * long → with scale=10⁶, safe beyond 10¹⁰ nodes. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iterations: Int = 3,
               dampingPct: Int = 85, scale: Long = 1000000L,
               idCol: String = "id", srcCol: String = "src",
               dstCol: String = "dst"): DataFrame = {
    require(dampingPct > 0 && dampingPct < 100, "dampingPct in (0,100)")
    // no nodes.count(): the rank count is not part of the fixed-point
    // formula, and a full scan just to assert non-emptiness is wasted
    // work at scale (an empty node set simply yields an empty result)
    val deg = edges.groupBy(col(srcCol)).agg(count(lit(1)).as("deg"))
    // materialize the (possibly expensive) edge lineage ONCE — every
    // iteration reads the cached table instead of recomputing upstream
    val ed = edges.join(deg, Seq(srcCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val teleport = (100 - dampingPct) * scale / 100
    var pr = nodes.select(col(idCol), lit(scale).as("pr"))
    for (_ <- 0 until iterations) {
      val contrib = ed.join(pr, ed(srcCol) === pr(idCol))
        .select(col(dstCol).as(idCol), expr("pr DIV deg").as("c"))
        .groupBy(col(idCol)).agg(sum(col("c")).as("sc"))
      pr = nodes.select(col(idCol)).join(contrib, Seq(idCol), "left")
        .select(col(idCol), (lit(teleport) +
          expr(s"($dampingPct * coalesce(sc, 0L)) DIV 100")).as("pr"))
    }
    // materialize the final rank vector (small: one row per node, two
    // columns) so the persisted edge table can be released NOW instead of
    // leaking until the session dies; localCheckpoint blocks are
    // reference-tracked and cleaned by the ContextCleaner when the result
    // is garbage-collected (same pattern as connectedComponents).
    // Tradeoff (deliberate, repo-wide for iterative ops): the call is
    // eager, and lineage truncation means a lost executor cannot
    // recompute the result — callers needing fault-tolerant lineage on a
    // preemptible cluster should write the ranks to storage instead
    val out = pr.select(col(idCol), col("pr").as("pr_micro")).localCheckpoint()
    ed.unpersist()
    out
  }
}
