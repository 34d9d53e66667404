package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent right
  * row with `right.ts <= left.ts` within the same key (the time-series
  * join of kdb/pandas `merge_asof`/DuckDB `ASOF JOIN`; e.g. "the last
  * quote at or before each trade", "the last page view before each
  * purchase").
  *
  * Spark has no as-of operator, and the naive formulation (range join +
  * per-left-row max) is quadratic per key. The scalable formulation is
  * union + ordered window: tag right rows side 0 and left rows side 1,
  * sort each key partition by (ts, side, right id), and carry the right
  * row's payload forward with `last(..., ignoreNulls)` over the
  * preceding-rows frame. Exactly ONE shuffle on the key — the same cost
  * as a grouped aggregation — and per-row window state is O(1), so the
  * shape holds at any scale and any key skew short of a single monster
  * key.
  *
  * All carried columns travel in ONE struct, so every output value comes
  * from the SAME (latest) right row even when some of its payload fields
  * are null — per-column forward-fill would silently mix fields from
  * different right rows.
  *
  * Determinism (hash-compare safe across engines): right rows sharing a
  * timestamp resolve to the highest right id (last in sort order); at
  * `left.ts == right.ts` the right row IS visible (inclusive as-of —
  * side 0 sorts before side 1). The sort key is never null: left rows
  * use __rid = -1.
  */
object AsOfJoin {

  /** @param carry       right-side payload columns to attach, as
    *                    (rightColumn -> outputName); list the right id/ts
    *                    columns here too if wanted in the output. Output
    *                    names must not collide with left columns.
    * @param rightIdCol  unique right column (castable to long) used as the
    *                    deterministic tie-break among equal timestamps.
    * @return left rows (all columns) plus the carried columns — null when
    *         no right row precedes (left-outer semantics). */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTsCol: String, rightTsCol: String,
                   rightIdCol: String,
                   carry: Seq[(String, String)]): DataFrame =
    asOfImpl(left, right, keyCols, leftTsCol, rightTsCol, rightIdCol,
      carry, forward = false)

  /** FORWARD as-of: attach the EARLIEST right row with
    * `rightTs >= leftTs` per key — "the next reading at or after this
    * moment" (next heartbeat after a deploy, next quote after an order,
    * label-at-horizon joins). Same union + one-keyed-window shape as
    * [[asOfBackward]] with the scan direction reversed; equal
    * timestamps match (inclusive), ties break to the smallest right id. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTsCol: String, rightTsCol: String,
                  rightIdCol: String,
                  carry: Seq[(String, String)]): DataFrame =
    asOfImpl(left, right, keyCols, leftTsCol, rightTsCol, rightIdCol,
      carry, forward = true)

  private def asOfImpl(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTsCol: String, rightTsCol: String,
                       rightIdCol: String,
                       carry: Seq[(String, String)],
                       forward: Boolean): DataFrame = {
    val outNames = carry.map(_._2)
    val leftCols = left.columns.toSeq
    val collisions = outNames.filter(n => leftCols.exists(_.equalsIgnoreCase(n)))
    require(collisions.isEmpty,
      s"carry output names collide with left columns: ${collisions.mkString(", ")}")
    val lSide = left
      .withColumn("__ts", col(leftTsCol))
      .withColumn("__side", lit(1))
      .withColumn("__rid", lit(-1L))
      .withColumn("__carry", lit(null))
    // the whole right payload rides in one struct: never null on right
    // rows (even if every field is), so the latest right row always wins
    val rSide = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).as("__ts"),
        lit(0).as("__side"),
        col(rightIdCol).cast("long").as("__rid"),
        struct(carry.map { case (rc, out) => col(rc).as(out) }: _*)
          .as("__carry")): _*)
    // pad the right side with the left-only columns (null), then union
    val rPadded = leftCols.filterNot(keyCols.contains)
      .foldLeft(rSide)((d, n) => d.withColumn(n, lit(null)))
    val unioned = lSide.unionByName(rPadded.select(lSide.columns.toIndexedSeq.map(col): _*))
    // forward = the same running scan over REVERSED time: right rows at
    // the left row's own timestamp stay visible (__side orders them
    // first either way); among equal right timestamps the last carry
    // wins, so rid runs desc in the forward scan to keep the smallest
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(
        if (forward) col("__ts").desc else col("__ts").asc,
        col("__side").asc,
        if (forward) col("__rid").desc else col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        outNames.map(n => col("__carry").getField(n).as(n)): _*)
  }
}
