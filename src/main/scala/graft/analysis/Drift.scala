package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitor: total-variation distance between a
  * keyed value distribution in two row populations (time halves,
  * yesterday-vs-today, source A vs B), computed over an equi-width
  * binning in EXACT integers — the pipeline tripwire that says "this
  * feed's value distribution moved", with a result reproducible
  * bit-for-bit on any engine.
  *
  * TV(P,Q) = ½·Σ|pᵢ−qᵢ| is emitted as the integer numerator
  * tv_num = Σᵢ |c¹ᵢ·n² − c²ᵢ·n¹| (divide by 2·n¹·n² at presentation):
  * counts are integers, so the sum is order-free, and no float
  * normalization enters the gate. Bins are derived from the POOLED
  * min/max per key so both populations share edges.
  *
  * Plan: one aggregation to per-(key, bin, side) counts, a pivot-free
  * conditional-sum to the (key, bin) contingency rows, one aggregation
  * to per-key TV — two keyed shuffles, no window, no driver state. */
object Drift {

  /** @param df      rows with key, integral value, and side ∈ {0, 1}
    * @param bins    equi-width bin count over the pooled per-key range
    * @return (key, n1, n2, tv_num) */
  def tvDrift(df: DataFrame, keyCol: String, valCol: String,
              sideCol: String, bins: Int = 16): DataFrame = {
    val v = df.select(col(keyCol).as("__k"),
      col(valCol).cast("long").as("__v"), col(sideCol).cast("int").as("__s"))
    val bounds = v.groupBy("__k")
      .agg(min("__v").as("__lo"), (max("__v") - min("__v") + 1).as("__w"))
    // per-key aggregates are |keys|-sized: joins back to the data go
    // broadcast via AQE when small, shuffled-hash when keys are many —
    // no hint, both shapes are right at their scale
    val binned = v.join(bounds, "__k")
      .withColumn("__bin", expr(s"((__v - __lo) * $bins) div __w"))
    val cells = binned.groupBy(col("__k"), col("__bin"))
      .agg(sum(when(col("__s") === 0, 1L).otherwise(0L)).as("__c1"),
        sum(when(col("__s") === 1, 1L).otherwise(0L)).as("__c2"))
    val totals = cells.groupBy("__k")
      .agg(sum("__c1").as("__n1"), sum("__c2").as("__n2"))
    cells.join(totals, "__k")
      .groupBy(col("__k").as(keyCol))
      .agg(max(col("__n1")).as("n1"), max(col("__n2")).as("n2"),
        sum(abs(col("__c1") * col("__n2") - col("__c2") * col("__n1")))
          .as("tv_num"))
  }
}
