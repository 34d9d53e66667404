package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid gap filling: densify a keyed (key, tick, value) table so
  * every key has one row per tick between its first and last
  * observation, missing ticks zero-filled, plus the running cumulative —
  * the "no silent holes in the time series" transform dashboards and
  * downstream window functions require.
  *
  * Plan shape: per-key bounds are one aggregation; the grid is
  * `explode(sequence(lo, hi))` — rows are generated distributed,
  * proportional to the OUTPUT size, never a cross join against a global
  * calendar table. The left join back to the observations hashes on
  * (key, tick), and the cumulative is one keyed window. Grid size is
  * the caller's contract: ticks should be a coarse unit (days, hours)
  * so |key| × span stays O(output).
  */
object GapFill {

  /** @return (key, tick, n, cum_n) densified per key over
    *         [min(tick), max(tick)] with n = 0 on generated rows. */
  def zeroFill(df: DataFrame, keyCol: String, tickCol: String,
               nCol: String): DataFrame = {
    val bounds = df.groupBy(col(keyCol))
      .agg(min(col(tickCol)).as("__lo"), max(col(tickCol)).as("__hi"))
    val grid = bounds.select(col(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as(tickCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tickCol))
    grid.join(df, Seq(keyCol, tickCol), "left")
      .withColumn(nCol, coalesce(col(nCol), lit(0L)))
      .withColumn(s"cum_$nCol", sum(col(nCol)).over(w))
  }
}
