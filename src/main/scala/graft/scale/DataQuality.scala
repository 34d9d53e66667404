package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks over arbitrary tables — the
  * validation layer a 100 TB ingest runs before anything downstream
  * trusts the data (the Deequ/Great-Expectations role, built from
  * plain aggregations so every check is one scan or one shuffle).
  *
  * Each check returns a one-row (check, n_checked, n_violations)
  * DataFrame; `report` unions them into the audit table. Violation
  * counts are exact integers — a gate either passes or it doesn't;
  * sampled or approximate validation defers exactly the debugging the
  * gate exists to prevent.
  *
  * Plan shapes: notNull/range are metadata-only scans (one pass,
  * map-side combined count); uniqueness is one hash shuffle on the key
  * (the same shuffle a downstream dedup would pay anyway); referential
  * integrity is a LEFT ANTI join — broadcast when the parent side is a
  * dimension, shuffled-hash otherwise, never a driver collect. */
object DataQuality {

  private def one(name: String, checked: Column, violations: Column,
                  df: DataFrame): DataFrame =
    df.agg(checked.cast("long").as("n_checked"),
        violations.cast("long").as("n_violations"))
      .select(lit(name).as("check"), col("n_checked"), col("n_violations"))

  /** Rows where `c` is null. */
  def notNull(df: DataFrame, c: String): DataFrame =
    one(s"not_null($c)", count(lit(1)),
      count(lit(1)) - count(col(c)), df)

  /** Rows outside [lo, hi]. */
  def inRange(df: DataFrame, c: String, lo: Column, hi: Column): DataFrame =
    one(s"in_range($c)", count(lit(1)),
      sum(when(col(c).isNull || col(c) < lo || col(c) > hi, 1L)
        .otherwise(0L)), df)

  /** Rows failing an arbitrary boolean predicate. */
  def satisfies(df: DataFrame, name: String, pred: Column): DataFrame =
    one(s"satisfies($name)", count(lit(1)),
      sum(when(pred, 0L).otherwise(1L)), df)

  /** Rows carrying a key that occurs more than once (every row of a
    * duplicated key counts as a violation, matching the intuition that
    * 2 rows sharing a supposedly-unique key are 2 bad rows). */
  def unique(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
    one(s"unique(${keyCols.mkString(",")})",
      sum(col("__c")), sum(when(col("__c") > 1, col("__c")).otherwise(0L)), g)
  }

  /** Child rows whose `childKey` has no match in `parent.parentKey`
    * (null child keys count as orphans — a null FK cannot join). */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("n")).select(col("n"))
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("v")).select(col("v"))
    total.join(broadcast(orphans))
      .select(lit(s"ref($childKey->$parentKey)").as("check"),
        col("n").cast("long").as("n_checked"),
        col("v").cast("long").as("n_violations"))
  }

  /** Functional-dependency audit `det → dep`: rows whose determinant
    * value maps to MORE than one dependent value (every row of a
    * violating determinant group counts, mirroring [[unique]]'s
    * row-level intuition). The schema-inference / normalization check
    * Deequ ships as hasUniqueness-style constraints: "customer_id →
    * country should hold — where doesn't it?". One groupBy on the
    * determinant with countDistinct(dep), map-side partial. */
  def functionalDependency(df: DataFrame, det: String,
                           dep: String): DataFrame = {
    val g = df.groupBy(col(det))
      .agg(count(lit(1)).as("__c"),
        countDistinct(col(dep)).as("__d"))
    one(s"fd($det->$dep)",
      sum(col("__c")),
      sum(when(col("__d") > 1, col("__c")).otherwise(0L)), g)
  }

  /** Union of independent checks — each keeps its own (already
    * minimal) plan; Spark runs them as one job DAG when the caller
    * materializes the report. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_.unionByName(_))

  /** Benford first-digit profile of a positive numeric column — the
    * classic fabricated-data tripwire (organic multiplicative data
    * leads with 1 ~30% of the time; uniform or hand-typed data
    * doesn't). Emits per leading digit the exact count and the
    * micro-unit share n·10⁶ div total; comparison against the Benford
    * expectation (log₁₀(1+1/d)) is presentation-side. One aggregation
    * over 9 groups + a broadcast total. */
  def benford(df: DataFrame, c: String): DataFrame = {
    // gate on the CAST value: a fractional 0 < x < 1 truncates to 0 and
    // would pollute the report with a bogus digit-0 bucket instead of
    // its first significant digit — scale sub-unit columns (cents,
    // micro-units) before profiling
    val digits = df.filter(col(c).cast("long") >= 1)
      .select(substring(col(c).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("__tot"))
    digits.join(broadcast(total))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div __tot").as("share_micro"))
  }

  /** ANALYZE-style column profile — the statistics table a cost-based
    * planner (or a data contract) wants per column: row count, nulls,
    * EXACT distinct count, min/max. One `stack` melt (single scan, rows
    * ×|cols| only inside the aggregation pipeline) and one aggregation
    * KEYED by column name, so each column's distinct-count shuffles
    * independently — profiling 50 columns is 50-way parallel, never a
    * driver loop of 50 jobs (the naive `for c in cols: df.agg(...)`
    * formulation re-scans the table per column). Values profile through
    * DOUBLE: uniform schema across columns; exactness of the distinct
    * count is unaffected (doubles compare exactly — no arithmetic is
    * performed on them). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val stacked = df.select(expr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', cast($c as double)").mkString(", ") +
        ") as (column_name, v)"))
    stacked.groupBy(col("column_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"),
        round(min(col("v")), 4).as("min_v"),
        round(max(col("v")), 4).as("max_v"))
  }
}
