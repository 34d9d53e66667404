package graft.cct

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.Schemas._
import graft.enrich.EventMatcher

/** Calling-context-tree construction (SURVEY §2.3 M5; pipit/util/cct.py:9-118,
  * pipit/graph.py:7-98).
  *
  * The reference builds a pointer graph of `Node` objects keyed by the
  * callpath string "a->b->c", dedup'd across processes, and stores the Node
  * object into a `Graph_Node` events column. We encode the tree relationally:
  * one row per distinct callpath, carrying `path_hash` (the 64-bit chained
  * hash emitted by [[EventMatcher]]), `parent_path_hash`, name, depth, and
  * the full path string. Events already carry `path_hash` as the foreign key.
  *
  * Scale shape: the heavy part — deduplicating callpaths across billions of
  * events — is one distributed `distinct()` over four small columns. The
  * result is the CCT itself, which is tiny by construction (distinct call
  * paths, not events), so the final path-string assembly and dense-id
  * assignment run on the driver; the node table then broadcasts back for
  * event→node joins. (An earlier level-by-level join formulation exploded
  * the Catalyst plan — the driver assembly is both faster and simpler.)
  *
  * node_id assignment: dense ids ordered by (depth, path) — deterministic
  * across runs and partitionings. (The reference's ids are visit-order
  * dependent and not deterministic across runs; SURVEY §7.4.)
  */
object Cct {

  /** Driver-assembly guard: real CCTs are ~10³–10⁶ nodes; a path-hash
    * column poisoned by non-callpath data (or a degenerate trace with
    * unbounded distinct paths) must fail loudly instead of OOMing the
    * driver. */
  val MaxNodes: Int = 5000000

  /** Distinct callpath table from (enriched) events. */
  def buildCct(events0: DataFrame): DataFrame = {
    val events = EventMatcher.enrich(events0)
    val spark = events.sparkSession
    val nodes = events
      .filter(col(EventType) === Enter && col(PathHash).isNotNull)
      .select(col(PathHash), col(ParentPathHash), col(Name), col(Depth))
      .distinct()
      .limit(MaxNodes + 1)
      .collect()
    require(nodes.length <= MaxNodes,
      s"CCT has more than $MaxNodes distinct callpaths — refusing driver-side " +
        "assembly. This usually means the trace's callpaths are degenerate " +
        "(e.g. data-dependent frame names); dedupe names before createCct.")

    val byHash = nodes.map(r => r.getLong(0) -> r).toMap
    val pathMemo = mutable.Map[Long, String]()
    def path(h: Long): String = pathMemo.getOrElseUpdate(h, {
      val r = byHash(h)
      if (r.isNullAt(1)) r.getString(2)
      else path(r.getLong(1)) + "->" + r.getString(2)
    })

    val rows = nodes.map { r =>
      (r.getLong(0), if (r.isNullAt(1)) null else Long.box(r.getLong(1)),
        r.getString(2), r.getInt(3), path(r.getLong(0)))
    }.sortBy { case (_, _, _, depth, p) => (depth, p) }
      .zipWithIndex.map { case ((ph, pph, name, depth, p), i) =>
        Row(i.toLong, ph, pph, name, depth, p)
      }

    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), cctSchema)
  }

  /** Bottom-up subtree rollup over the CCT — per calling context, the
    * exclusive time of the node itself AND of its whole subtree (the
    * flame-graph "total" column next to "self"). Own values come from
    * one distributed (path_hash) aggregation over events; propagation
    * then runs level-by-level from the deepest level up — maxDepth
    * joins of CCT-SIZED tables (bounded by [[MaxNodes]], broadcast),
    * never an events-sized path-prefix join. All sums are integer ns. */
  def subtreeRollup(events0: DataFrame): DataFrame = {
    val events = EventMatcher.enrich(events0)
    val withExc = graft.enrich.Metrics.calcExcMetrics(events, Seq(TimestampNs))
    val cct = buildCct(events)
    val own = withExc.filter(col(EventType) === Enter && col(PathHash).isNotNull)
      .groupBy(col(PathHash))
      .agg(count(lit(1)).as("n_calls"), sum(col(TimeExc)).as("own_exc"))
    val maxDepth = cct.agg(max(col("depth"))).head.getInt(0)
    var acc = cct
      .join(broadcast(own), Seq(PathHash), "left")
      .select(col(PathHash), col(ParentPathHash), col("name"), col("depth"),
        col("path"), coalesce(col("n_calls"), lit(0L)).as("n_calls"),
        coalesce(col("own_exc"), lit(0L)).as("own_exc"))
      .withColumn("subtree_exc", col("own_exc"))
      .localCheckpoint() // each level below re-reads the accumulator
    for (d <- maxDepth until 0 by -1) {
      val childSums = acc.filter(col("depth") === d)
        .groupBy(col(ParentPathHash).as(PathHash))
        .agg(sum(col("subtree_exc")).as("__cs"))
      acc = acc.join(broadcast(childSums), Seq(PathHash), "left")
        .withColumn("subtree_exc",
          col("subtree_exc") + coalesce(col("__cs"), lit(0L)))
        .drop("__cs")
        .localCheckpoint()
    }
    acc.select(col("path"), col("name"), col("depth"), col("n_calls"),
      col("own_exc"), col("subtree_exc"))
  }

  /** Attach node_id to events (the reference's `Graph_Node` column,
    * pipit/util/cct.py:116) via the path_hash foreign key; the CCT is small
    * → broadcast join. */
  def withNodeIds(events0: DataFrame, cct: DataFrame): DataFrame = {
    val events = EventMatcher.enrich(events0)
    events.join(broadcast(cct.select(col("path_hash"), col("node_id"))),
      Seq(PathHash), "left")
  }
}
