package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed order statistics by EXPLICIT ranking — percentiles and
  * median-absolute-deviation outliers selected as "the value at rank
  * ⌈p·n⌉", never by interpolation. Interpolated quantiles (Spark
  * `percentile`, SQL `quantile_cont`) mix engine-specific floating-point
  * blends of neighboring values; the rank-selected order statistic is a
  * value that EXISTS in the data, identical on any engine — the property
  * the oracle gate (and any cross-engine reconciliation) needs.
  *
  * Plan shape: one keyed window (single exchange, O(1) state per row)
  * ranks each group; selection is then a conditional aggregation on the
  * SAME key, so Spark reuses the exchange. Per-key results are joined
  * back by broadcast (one row per key). Monster-key skew behaves like
  * any keyed window: a single key's rows sort within one task — salting
  * the rank (two-level selection) is the escape hatch if one key holds
  * billions of rows.
  */
object RobustStats {

  /** ⌈n·num/den⌉ over the window-count column `n`, in pure integer
    * arithmetic — `ceil(n * 0.9)` is NOT portable (0.9 has no exact
    * binary representation: a double engine computes 50·0.9 =
    * 45.000…001 → ⌈⌉ = 46, a decimal engine gets 45), while
    * (num·n + den − 1) div den is bit-identical everywhere. */
  private def rankAt(num: Int, den: Int): Column =
    expr(s"($num * n + ${den - 1}) div $den")

  /** Per-key order-statistic summary: n, p50, p90, max of `valCol`
    * (read at ranks ⌈0.5n⌉/⌈0.9n⌉/n in (value, id) order). */
  def percentiles(df: DataFrame, keyCol: String, valCol: String,
                  idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valCol), col(idCol))
    df.select(col(keyCol), col(valCol), col(idCol))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === rankAt(1, 2), col(valCol))).as("p50"),
        max(when(col("rn") === rankAt(9, 10), col(valCol))).as("p90"),
        max(when(col("rn") === col("n"), col(valCol))).as("max"))
  }

  /** Robust outliers per key: |v − median| > k·MAD, with median and MAD
    * both rank-selected (lower median at ⌈n/2⌉). Integer-exact when
    * `valCol` is integral. Two window passes + two broadcast joins of
    * one-row-per-key tables; rows in keys with MAD = 0 are flagged only
    * when they deviate at all (dev > 0 = k·0). */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
                  idCol: String, k: Int = 5): DataFrame = {
    val base = df.select(col(keyCol), col(valCol), col(idCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valCol), col(idCol))
    val med = base.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .filter(col("rn") === rankAt(1, 2))
      .select(col(keyCol), col(valCol).as("med"))
    val withDev = base.join(broadcast(med), Seq(keyCol))
      .withColumn("dev", abs(col(valCol) - col("med")))
    val wd = Window.partitionBy(col(keyCol)).orderBy(col("dev"), col(idCol))
    val mad = withDev.withColumn("rn", row_number().over(wd))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .filter(col("rn") === rankAt(1, 2))
      .select(col(keyCol), col("dev").as("mad"))
    withDev.join(broadcast(mad), Seq(keyCol))
      .filter(col("dev") > col("mad") * k)
      .select(col(keyCol), col(idCol), col(valCol), col("med"), col("mad"),
        col("dev"))
  }
}
