package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-point detection on keyed count series — "which day did this
  * stream's behavior change" over per-key daily volumes, the monitoring
  * question behind ingestion regressions and source drift.
  *
  * Statistic: the integer CUSUM objective. For a key with m ordered
  * buckets and total count T, the cumulative count C_r through rank r
  * deviates from the uniform ramp by |m·C_r − r·T| (both products
  * BIGINT — the ×m/×T cross-multiplication clears the fractions, so the
  * score is EXACT and order-free; a float mean-deviation formulation
  * drifts across engines). The change point is the bucket maximizing the
  * score (ties → earliest bucket), which for a single level shift is the
  * last pre-shift bucket.
  *
  * Plan: one keyed aggregation to buckets, two keyed windows (running
  * sum, then argmax) over |buckets|-sized groups — nothing global, skew
  * bounded by the largest key's bucket count. */
object Changepoint {

  /** @param counts  (keyCol, bucketCol, nCol) rows, one per observed
    *                bucket (missing buckets count as absent, not zero —
    *                zero-fill upstream via GapFill if the grid matters)
    * @return per key: the arg-max bucket, its integer score, m, T */
  def cusumMax(counts: DataFrame, keyCol: String, bucketCol: String,
               nCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val ordered = byKey.orderBy(col(bucketCol))
    val scored = counts
      .withColumn("__r", row_number().over(ordered).cast("long"))
      .withColumn("__cum", sum(col(nCol)).over(ordered))
      .withColumn("__m", count(lit(1)).over(byKey))
      .withColumn("__t", sum(col(nCol)).over(byKey))
      .withColumn("score",
        abs(col("__m") * col("__cum") - col("__r") * col("__t")))
    val best = Window.partitionBy(col(keyCol))
      .orderBy(col("score").desc, col(bucketCol))
    scored.withColumn("__rn", row_number().over(best))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(bucketCol).as("change_bucket"), col("score"),
        col("__m").as("n_buckets"), col("__t").cast("long").as("total"))
  }
}
