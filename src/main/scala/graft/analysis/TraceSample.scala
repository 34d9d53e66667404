package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Schemas._

/** Structure-preserving trace reduction — deterministic sampling of whole
  * TOP-LEVEL CALL TREES. Row-level sampling of a trace is useless: it
  * orphans Enter/Leave pairs, so matching, depth, metrics, and every
  * downstream analysis break. Sampling the unit a trace analyst actually
  * thinks in — the top-level call and everything nested under it — keeps
  * the surviving stream well-formed: the matcher, profiles, and the CCT
  * run on the sample unchanged, and per-tree statistics are an unbiased
  * num/den subsample.
  *
  * The tree key needs no prior enrichment: ONE per-process window pass
  * computes the running Enter−Leave depth and the timestamp of the most
  * recent top-level Enter (a running max — the orderBy tiebreak
  * `event_type` sorts Enter < Instant < Leave, so zero-duration frames
  * close correctly). A tree is kept iff md5(seed:process:root_ts) mod
  * den < num — deterministic, engine-replicable, and identical for
  * every event of the tree. Instants outside any call adopt the
  * preceding tree's key (first-tree instants hash on the process alone).
  *
  * Scale shape: one keyed exchange, O(1) window state per row — the same
  * single-pass cost as the matcher's cheapest formulation; no join, no
  * driver state. */
object TraceSample {

  def sampleCalls(events: DataFrame, num: Int, den: Int,
                  seed: Int = 7): DataFrame = {
    require(den > 0, s"den must be positive: $den")
    require(num >= 0 && num <= den, s"num must be in [0, den]: $num/$den")
    val w = Window.partitionBy(col(Process))
      .orderBy(col(TimestampNs), col(EventType))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val delta = when(col(EventType) === Enter, 1)
      .when(col(EventType) === Leave, -1).otherwise(0)
    events
      .withColumn("__depth_after", sum(delta).over(w))
      .withColumn("__root_ts", max(when(
        col(EventType) === Enter && col("__depth_after") === 1,
        col(TimestampNs))).over(w))
      .filter(graft.scale.TextOps.md5Hash60(
        concat_ws(":", col(Process), col("__root_ts")), seed) % den < num)
      .drop("__depth_after", "__root_ts")
  }
}
