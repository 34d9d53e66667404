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
  *
  * User columns are renamed onto reserved `__` names internally — a
  * value column that happens to be called "n" or "rn" must not collide
  * with the ranking scaffolding (it did: a count column named `n` was
  * silently overwritten by the window count, turning the median into
  * the group size).
  */
object RobustStats {

  /** ⌈n·num/den⌉ over the window-count column `__n`, in pure integer
    * arithmetic — `ceil(n * 0.9)` is NOT portable (0.9 has no exact
    * binary representation: a double engine computes 50·0.9 =
    * 45.000…001 → ⌈⌉ = 46, a decimal engine gets 45), while
    * (num·n + den − 1) div den is bit-identical everywhere. */
  private def rankAt(num: Int, den: Int): Column =
    expr(s"($num * __n + ${den - 1}) div $den")

  private def reserved(df: DataFrame, keyCol: String, valCol: String,
                       idCol: String): DataFrame =
    df.select(col(keyCol).as("__key"), col(valCol).as("__val"),
      col(idCol).as("__id"))

  /** Per-key order-statistic summary: n, p50, p90, max of `valCol`
    * (read at ranks ⌈0.5n⌉/⌈0.9n⌉/n in (value, id) order). */
  def percentiles(df: DataFrame, keyCol: String, valCol: String,
                  idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__key")).orderBy(col("__val"), col("__id"))
    reserved(df, keyCol, valCol, idCol)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__key"))))
      .groupBy(col("__key"))
      .agg(max(col("__n")).as("n"),
        max(when(col("__rn") === rankAt(1, 2), col("__val"))).as("p50"),
        max(when(col("__rn") === rankAt(9, 10), col("__val"))).as("p90"),
        max(when(col("__rn") === col("__n"), col("__val"))).as("max"))
      .withColumnRenamed("__key", keyCol)
  }

  /** Per-key WINSORIZED mean — the robust location estimate that keeps
    * every observation (unlike a trimmed mean) but clamps the tails:
    * values below the p(num/den) order statistic rise to it, values
    * above the mirrored upper statistic drop to it, then a plain mean.
    * The clamp bounds are rank-SELECTED (⌈n·num/den⌉ and its mirror
    * n+1−⌈n·num/den⌉ in (value, id) order), so with integral inputs
    * every emitted number — bounds, clamped sum, truncated mean — is
    * bit-identical across engines. One keyed ranking window + one
    * aggregation, the [[percentiles]] plan shape. */
  def winsorMean(df: DataFrame, keyCol: String, valCol: String,
                 idCol: String, num: Int = 1, den: Int = 10): DataFrame = {
    require(num > 0 && den > 0 && 2 * num < den,
      s"tail fraction must be in (0, 1/2): $num/$den")
    val w = Window.partitionBy(col("__key")).orderBy(col("__val"), col("__id"))
    val byKey = Window.partitionBy(col("__key"))
    reserved(df, keyCol, valCol, idCol)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("__lo",
        max(when(col("__rn") === rankAt(num, den), col("__val"))).over(byKey))
      .withColumn("__hi",
        max(when(col("__rn") === col("__n") + 1 - rankAt(num, den),
          col("__val"))).over(byKey))
      .groupBy(col("__key"))
      .agg(max(col("__n")).as("n"),
        max(col("__lo")).as("lo"), max(col("__hi")).as("hi"),
        sum(greatest(col("__lo"), least(col("__hi"), col("__val"))))
          .as("winsor_sum"))
      .withColumn("winsor_mean", expr("winsor_sum div n"))
      .withColumnRenamed("__key", keyCol)
  }

  /** Per-key equi-depth bucket boundaries: the `buckets`−1 interior
    * quantile values read at ranks ⌈q·n/buckets⌉, q = 1..buckets−1 —
    * the rank-selected (engine-exact) version of an equi-depth
    * histogram / NTILE boundary grid. Same single-exchange shape as
    * [[percentiles]]: one keyed ranking window, then a 9× projection
    * explode + filter on the SAME partitioning — no join, no second
    * shuffle. Several q may select the same row for tiny groups
    * (deterministically — the formula is pure integer). */
  def equidepth(df: DataFrame, keyCol: String, valCol: String,
                idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val w = Window.partitionBy(col("__key")).orderBy(col("__val"), col("__id"))
    reserved(df, keyCol, valCol, idCol)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__key"))))
      .select(col("__key"), col("__val"), col("__rn"), col("__n"),
        explode(sequence(lit(1), lit(buckets - 1))).as("q"))
      .filter(col("__rn") === expr(s"(q * __n + ${buckets - 1}) div $buckets"))
      .select(col("__key").as(keyCol), col("q"),
        col("__rn").as("rank_sel"), col("__val").as("boundary"))
  }

  /** Robust outliers per key: |v − median| > k·MAD, with median and MAD
    * both rank-selected (lower median at ⌈n/2⌉). Integer-exact when
    * `valCol` is integral. Two window passes + two broadcast joins of
    * one-row-per-key tables; rows in keys with MAD = 0 are flagged only
    * when they deviate at all (dev > 0 = k·0). */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
                  idCol: String, k: Int = 5): DataFrame = {
    val base = reserved(df, keyCol, valCol, idCol)
    val w = Window.partitionBy(col("__key")).orderBy(col("__val"), col("__id"))
    val med = base.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__key"))))
      .filter(col("__rn") === rankAt(1, 2))
      .select(col("__key"), col("__val").as("__med"))
    val withDev = base.join(broadcast(med), Seq("__key"))
      .withColumn("__dev", abs(col("__val") - col("__med")))
    val wd = Window.partitionBy(col("__key")).orderBy(col("__dev"), col("__id"))
    val mad = withDev.withColumn("__rn", row_number().over(wd))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__key"))))
      .filter(col("__rn") === rankAt(1, 2))
      .select(col("__key"), col("__dev").as("__mad"))
    withDev.join(broadcast(mad), Seq("__key"))
      .filter(col("__dev") > col("__mad") * k)
      .select(col("__key").as(keyCol), col("__id").as(idCol),
        col("__val").as(valCol), col("__med").as("med"),
        col("__mad").as("mad"), col("__dev").as("dev"))
  }

  /** Rolling median over the last `window` rows per key — the robust
    * smoother for noisy counters (a single spike moves a moving average
    * by spike/W, a rolling median not at all). Selection, not
    * interpolation: the lower median at integer rank ⌈n/2⌉ of the
    * frame's values, so the result is a value that EXISTS in the data
    * and is bit-identical on any engine.
    *
    * Plan: one keyed window; the frame's values fold via collect_list
    * → sort_array → element_at — O(W log W) per row, fine for the
    * small W (7/28/90) rolling stats use. Frames at the series head
    * are partial (n < W), matching the usual "expanding then rolling"
    * dashboard convention. */
  def rollingMedian(df: DataFrame, keyCol: String, tickCol: String,
                    valCol: String, window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tickCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    df.withColumn("__frame", sort_array(collect_list(col(valCol)).over(w)))
      .withColumn("roll_n", size(col("__frame")).cast("long"))
      .withColumn("roll_med",
        element_at(col("__frame"), expr("(roll_n + 1) div 2").cast("int")))
      .drop("__frame")
  }
}
