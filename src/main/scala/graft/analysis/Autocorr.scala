package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lagged autocovariance statistics over a keyed, integer-valued,
  * regularly-gridded series (e.g. per-hour event counts) — the building
  * block for ACF plots, seasonality detection, and anomaly baselines.
  *
  * Emits, per (key, lag), the EXACT integer sufficient statistics of
  * Pearson r between the series and its lag-shifted self over the
  * overlap window: n, Σx, Σy, Σxy, Σx², Σy². The correlation itself is
  * r = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²)) — a presentation-side
  * division; keeping the result integral makes it order-free and
  * engine-exact (a float Σ would depend on reduction order).
  *
  * Plan shape: the grid is densified per key (gap ticks count 0 — a gap
  * IS a zero observation for a count series), the lag shift is an
  * equi-join of the grid with itself on (key, tick+lag) after a small
  * explode of the lag list, then one hash aggregation on (key, lag).
  * Rows scale as |series| × |lags|; the join hashes on (key, tick) —
  * no window over the whole series, no driver collect.
  */
object Autocorr {

  /** @param df      observations (keyCol, tickCol, nCol) — at most one
    *                row per (key, tick); missing ticks are treated as 0
    * @param lags    lag offsets (in ticks) to evaluate
    * @return (key, lag, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2) where
    *         x = value at tick t, y = value at tick t + lag, t ranging
    *         over ticks where both ends fall inside the filled grid */
  def lagStats(df: DataFrame, keyCol: String, tickCol: String,
               nCol: String, lags: Seq[Int]): DataFrame = {
    val filled = GapFill.zeroFill(df, keyCol, tickCol, nCol)
      .select(col(keyCol), col(tickCol).cast("long").as(tickCol),
        col(nCol).cast("long").as(nCol))
    val lagged = filled
      .withColumn("lag", explode(array(lags.map(l => lit(l.toLong)): _*)))
      .select(col(keyCol), col("lag"),
        (col(tickCol) - col("lag")).as(tickCol), col(nCol).as("__y"))
    filled.join(lagged, Seq(keyCol, tickCol))
      .groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col(nCol)).as("sum_x"), sum(col("__y")).as("sum_y"),
        sum(col(nCol) * col("__y")).as("sum_xy"),
        sum(col(nCol) * col(nCol)).as("sum_x2"),
        sum(col("__y") * col("__y")).as("sum_y2"))
  }
}
