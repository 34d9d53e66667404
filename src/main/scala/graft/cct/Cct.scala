package graft.cct

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * node_id assignment: dense ids via `row_number()` ordered by (depth, path)
  * — deterministic across runs and partitionings. (The reference's ids are
  * visit-order dependent and not deterministic across runs; SURVEY §7.4.)
  */
object Cct {

  /** Distinct callpath table from enriched events. */
  def buildCct(events0: DataFrame): DataFrame = {
    val events = EventMatcher.enrich(events0)
    val nodes = events
      .filter(col(EventType) === Enter && col(PathHash).isNotNull)
      .select(col(PathHash).as("path_hash"), col(Name).as("name"), col(Depth).as("depth"))
      .distinct()

    // recover parent hash + path string by walking depth levels down from the
    // roots; depth is bounded by call depth (small), so this loop is short
    // and each step is a broadcast-joinable level (#nodes per level is tiny
    // relative to events).
    val maxDepth = nodes.agg(max(col("depth"))).head() match {
      case r if r.isNullAt(0) => -1
      case r => r.getInt(0)
    }
    if (maxDepth < 0) return events.sparkSession.createDataFrame(
      events.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], cctSchema)

    // each node's parent link comes from the events: a child Enter's
    // parent_event_id points at the parent Enter, whose path_hash is the
    // parent's node key — one self-join on events recovers (child hash →
    // parent hash) pairs.
    val enters = events.filter(col(EventType) === Enter && col(PathHash).isNotNull)
    val links = enters.alias("c")
      .join(enters.select(col(EventId).as("__pid"), col(PathHash).as("parent_path_hash")).alias("p"),
        col(s"c.$ParentEventId") === col("__pid"), "left")
      .select(col(s"c.$PathHash").as("path_hash"), col("parent_path_hash"))
      .distinct()

    var level = nodes.filter(col("depth") === 0)
      .join(links, Seq("path_hash"), "left")
      .withColumn("path", col("name"))
    var acc = level
    var d = 1
    while (d <= maxDepth) {
      val parents = acc.filter(col("depth") === d - 1)
        .select(col("path_hash").as("__ph"), col("path").as("__ppath"))
      level = nodes.filter(col("depth") === d)
        .join(links, Seq("path_hash"), "left")
        .join(broadcast(parents), col("parent_path_hash") === col("__ph"), "left")
        .withColumn("path", concat_ws("->", col("__ppath"), col("name")))
        .drop("__ph", "__ppath")
      acc = acc.unionByName(level)
      d += 1
    }

    acc.withColumn("node_id",
        row_number().over(Window.orderBy(col("depth"), col("path"))).cast("long") - 1)
      .select(col("node_id"), col("path_hash"), col("parent_path_hash"),
        col("name"), col("depth"), col("path"))
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
