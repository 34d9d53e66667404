package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history builder: compress a keyed
  * event stream carrying an attribute into validity intervals — one row
  * per run of consecutive equal attribute values, with
  * [valid_from, valid_to) bounds where valid_to is NULL for the current
  * (open) version. The warehouse "UPSERT into SCD2 dimension" operation
  * expressed as a batch transform.
  *
  * Plan shape: one keyed window pass to flag change points (row 1 or
  * attribute differs from its predecessor under null-safe comparison),
  * a running sum for the version ordinal, one aggregation per
  * (key, version), and a second tiny window over the per-version table
  * for the valid_to lead. Both exchanges hash on the key — at 100 TB
  * this is two shuffles of the event table, no self-join.
  */
object Scd {

  /** @return (key, version, attr, valid_from, valid_to, n_rows);
    *         `tieCol` must make (ts, tie) unique per key so the run
    *         compression is deterministic under equal timestamps. */
  def type2(df: DataFrame, keyCol: String, tsCol: String, attrCol: String,
            tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(attrCol), 1).over(w)
    val versions = df
      .withColumn("__chg",
        when(row_number().over(w) === 1, 1L)
          .when(!(col(attrCol) <=> prev), 1L).otherwise(0L))
      .withColumn("version", sum(col("__chg")).over(w))
      .groupBy(col(keyCol), col("version"))
      .agg(min(col(attrCol)).as("attr"), // constant within a version
        min(col(tsCol)).as("valid_from"), count(lit(1)).as("n_rows"))
    val wv = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    versions
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .select(col(keyCol), col("version"), col("attr"), col("valid_from"),
        col("valid_to"), col("n_rows"))
  }
}
