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
  /** The shared pooled-equi-width binning pipeline both drift metrics
    * run on — ONE definition so the metrics can never bin differently:
    * per-(key, bin) side counts (`cells`) and per-key side totals.
    * Per-key aggregates are |keys|-sized: joins back to the data go
    * broadcast via AQE when small, shuffled-hash when keys are many —
    * no hint, both shapes are right at their scale. */
  private def binnedCells(df: DataFrame, keyCol: String, valCol: String,
                          sideCol: String,
                          bins: Int): (DataFrame, DataFrame) = {
    val v = df.select(col(keyCol).as("__k"),
      col(valCol).cast("long").as("__v"), col(sideCol).cast("int").as("__s"))
    val bounds = v.groupBy("__k")
      .agg(min("__v").as("__lo"), (max("__v") - min("__v") + 1).as("__w"))
    val binned = v.join(bounds, "__k")
      .withColumn("__bin", expr(s"((__v - __lo) * $bins) div __w"))
    val cells = binned.groupBy(col("__k"), col("__bin"))
      .agg(sum(when(col("__s") === 0, 1L).otherwise(0L)).as("__c1"),
        sum(when(col("__s") === 1, 1L).otherwise(0L)).as("__c2"))
    val totals = cells.groupBy("__k")
      .agg(sum("__c1").as("__n1"), sum("__c2").as("__n2"))
    (cells, totals)
  }

  def tvDrift(df: DataFrame, keyCol: String, valCol: String,
              sideCol: String, bins: Int = 16): DataFrame = {
    val (cells, totals) = binnedCells(df, keyCol, valCol, sideCol, bins)
    cells.join(totals, "__k")
      .groupBy(col("__k").as(keyCol))
      .agg(max(col("__n1")).as("n1"), max(col("__n2")).as("n2"),
        sum(abs(col("__c1") * col("__n2") - col("__c2") * col("__n1")))
          .as("tv_num"))
  }

  /** Population Stability Index per key — the model-monitoring standard
    * for "has this feature's distribution shifted between the reference
    * and current populations": PSI = Σ_bins (p−q)·ln(p/q) with add-one
    * count smoothing (p = (c₁+1)/(n₁+B), q likewise), over the SAME
    * pooled equi-width bins as [[tvDrift]]. PSI weights the tail moves
    * TV treats linearly (the conventional alert bands: <0.1 stable,
    * 0.1–0.25 moderate, >0.25 shifted). Smoothing makes every bin —
    * including bins one side never hits — contribute a finite term, so
    * the full B-bin grid is generated per key (keys-sized work). Counts
    * are exact integers; only the final 16-term Σ is float, emitted at
    * 6dp (the repo's float-tolerance convention).
    * @return (key, n1, n2, psi) */
  def psiDrift(df: DataFrame, keyCol: String, valCol: String,
               sideCol: String, bins: Int = 16): DataFrame = {
    val (cells, totals) = binnedCells(df, keyCol, valCol, sideCol, bins)
    // full bin grid so empty bins contribute their smoothing floor
    val grid = totals.select(col("__k"), col("__n1"), col("__n2"),
        explode(sequence(lit(0), lit(bins - 1))).as("__b"))
      .withColumn("__bin", col("__b").cast("long")).drop("__b")
    grid.join(cells, Seq("__k", "__bin"), "left")
      .select(col("__k"), col("__n1"), col("__n2"),
        ((coalesce(col("__c1"), lit(0L)) + 1).cast("double") /
          (col("__n1") + bins).cast("double")).as("__p"),
        ((coalesce(col("__c2"), lit(0L)) + 1).cast("double") /
          (col("__n2") + bins).cast("double")).as("__q"))
      .groupBy(col("__k").as(keyCol))
      .agg(max(col("__n1")).as("n1"), max(col("__n2")).as("n2"),
        round(sum((col("__p") - col("__q")) * log(col("__p") / col("__q"))), 6)
          .as("psi"))
  }
}
