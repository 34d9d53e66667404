package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two integer
  * dimensions so that range-partitioning + sorting on the single z
  * value co-locates rows that are close in BOTH dimensions. Writing a
  * table clustered this way makes parquet row-group min/max statistics
  * selective for 2-D predicates (x BETWEEN … AND y BETWEEN …) — the
  * layout trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed with
  * plain Spark primitives.
  *
  * The z value is a pure bit-shuffle of the inputs (codegen'd
  * shift/mask/or chain — no UDF), so engines agree on it exactly.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: bit i of x lands at position 2i, bit i of y at 2i+1. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Serpentine weight-balanced shard assignment — the write-side plan
    * for token-balanced training shards: rank rows by (weight desc, id
    * tie-break), then deal rank r to shard r mod S on even passes and
    * S−1−(r mod S) on odd passes. The snake deal keeps per-shard weight
    * sums within one max-item of each other on the sorted stream (the
    * classic LPT-style guarantee), so downstream training readers get
    * equal-work shards without a bin-packing solver. One distributed
    * sort total: the rank comes from [[graft.ingest.Ingest.assignDenseIds]]
    * (range-partitioned sort + zipWithIndex) — never an unpartitioned
    * ranking window — and the shard id is pure integer arithmetic after.
    * Deterministic for a fixed input set. */
  def balancedShards(df: DataFrame, weightCol: String, idCol: String,
                     numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    graft.ingest.Ingest.assignDenseIds(df, "__shard_rank",
        col(weightCol).desc, col(idCol))
      .withColumn("shard",
        when(expr(s"(__shard_rank div $numShards) % 2") === 0,
            col("__shard_rank") % numShards)
          .otherwise(lit(numShards - 1) - col("__shard_rank") % numShards)
          .cast("int"))
      .drop("__shard_rank")
  }

  /** Re-layout `df` so each output partition holds a contiguous,
    * disjoint z range (range partition on z, sorted within): the
    * write-side half of z-order clustering. Pass `keepZ = true` to
    * retain the computed `__z` column (e.g. for layout audits). */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String, bits: Int,
                 numPartitions: Int, keepZ: Boolean = false): DataFrame = {
    val z = df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
    if (keepZ) z else z.drop("__z")
  }
}
