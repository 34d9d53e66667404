package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the batch twin of the
  * Structured Streaming session-window (see graft.streaming). One shuffle
  * on the key; session ids via lag + running sum windows (both execute in
  * the same window stage over the same partitioning). */
object Sessionize {

  /** Assign session ids per key: a new session starts when the gap to the
    * previous event exceeds `gapMicros`. `tsCol` must be in microseconds
    * (or any unit consistent with the gap). */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 orderCol: String, gapMicros: Long): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    val prev = lag(col(tsCol), 1).over(byTime)
    events
      .withColumn("__new_session",
        when(prev.isNull || col(tsCol) - prev > gapMicros, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new_session")).over(byTime.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_session")
  }

  /** Per-session aggregate: event count (long-form). */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
                    orderCol: String, gapMicros: Long): DataFrame =
    sessionize(events, keyCol, tsCol, orderCol, gapMicros)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Per-session engagement report — the product-analytics staples on
    * top of [[sessionize]]: event count, dwell (last−first event time;
    * 0 for singletons), and the bounce flag (a one-event session).
    * Same single keyed exchange as sessionize; the rollup rides the
    * (key, session) grouping with map-side partial aggregation. */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
                   orderCol: String, gapMicros: Long): DataFrame =
    sessionize(events, keyCol, tsCol, orderCol, gapMicros)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration_us"),
        when(count(lit(1)) === 1, 1).otherwise(0).as("bounce"))

  /** Ordered conversion funnel: for each key, the earliest time each
    * step completes GIVEN the previous step completed before it —
    * t₁ = min ts of step 1, tᵢ = min ts of step i strictly after tᵢ₋₁
    * (the standard strictly-sequential funnel definition; re-orderings
    * don't count). Returns one row per key with the step times (null
    * where the funnel stalls) and the reached depth.
    *
    * One filtered aggregation per step, chained by an equi-join on the
    * key — n_steps shuffles of per-key aggregates (never the raw event
    * stream after step 1); the conditional min keeps each stage a
    * partial+final aggregation. */
  def funnel(events: DataFrame, steps: Seq[String], keyCol: String,
             tsCol: String, stepCol: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(stepCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t1"))
    val full = steps.zipWithIndex.tail.foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t$i"
        val cur = s"t${i + 1}"
        acc.join(events.filter(col(stepCol) === step)
            .select(col(keyCol), col(tsCol).as("__ts")), Seq(keyCol), "left")
          .groupBy((col(keyCol) +: (1 to i).map(j => col(s"t$j"))): _*)
          .agg(min(when(col("__ts") > col(prev), col("__ts"))).as(cur))
    }
    val depth = (1 to steps.length)
      .map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    full.withColumn("depth", depth)
  }

  /** Cohort retention matrix: users are cohorted by the day of their
    * first event; each (cohort_day, day_offset) cell counts the distinct
    * users of that cohort active `day_offset` days later, plus the
    * cohort size and the retention ratio — the standard product-analytics
    * view of an event stream.
    *
    * One corpus shuffle total: groupBy(user) with collect_set(day) —
    * per-user state is bounded by the date horizon, never the event
    * count, and partial aggregation dedups map-side. The explode emits
    * |user|·|active days| rows (already distinct), and the final
    * aggregation + cohort-size window run over a horizon²-sized table —
    * driver-trivial at any corpus size. Day indices are integer
    * microsecond divisions, so every cell is engine-exact.
    *
    * `tsCol` must be in microseconds. */
  /** First-order Markov transition counts over per-key event streams —
    * the "what do users do next" matrix behind journey analysis and
    * next-event models. One keyed window (lag) + one aggregation; counts
    * stay INTEGER (consumers derive probabilities as n/row_total — the
    * division is left to presentation so the table is engine-exact).
    * Deterministic tie-break: equal timestamps order by the unique id. */
  def transitions(events: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val steps = events
      .withColumn("__from", lag(col(stateCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_state"), col(stateCol).as("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy(col("from_state"))
      .agg(sum(col("n")).as("row_total"))
    steps.join(broadcast(totals), Seq("from_state"))
  }

  /** Order-3 path mining — the trigram extension of [[transitions]]:
    * counts of consecutive (s₁ → s₂ → s₃) state sequences per key
    * ordering, the "what do users do in threes" view that exposes loops
    * and funnels a first-order transition matrix averages away. Same
    * single keyed window (two leads share one sort), then a global
    * |states|³-bounded aggregation with map-side combine. */
  def transitions3(events: DataFrame, keyCol: String, tsCol: String,
                   idCol: String, stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("__s2", lead(col(stateCol), 1).over(w))
      .withColumn("__s3", lead(col(stateCol), 2).over(w))
      .filter(col("__s3").isNotNull)
      .groupBy(col(stateCol).as("s1"), col("__s2").as("s2"),
        col("__s3").as("s3"))
      .agg(count(lit(1)).as("n"))
  }

  def cohortRetention(events: DataFrame, keyCol: String = "user_id",
                      tsCol: String = "t_us",
                      dayMicros: Long = 86400000000L): DataFrame = {
    val perUser = events
      .select(col(keyCol), expr(s"$tsCol div $dayMicros").as("day"))
      .groupBy(col(keyCol))
      .agg(min(col("day")).as("cohort_day"), collect_set(col("day")).as("days"))
    val cells = perUser
      .select(col("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    val w = Window.partitionBy(col("cohort_day"))
    cells
      .withColumn("cohort_size",
        max(when(col("day_offset") === 0, col("n_active"))).over(w))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active") / col("cohort_size"), 4).as("retention"))
  }

  /** Daily + rolling-window active users (DAU / WAU-style): per observed
    * day, the count of distinct users active that day and the count of
    * distinct users active in the trailing `window` days. The hard part
    * at scale is the ROLLING DISTINCT — a naive formulation re-scans the
    * window per day or funnels the stream through a global window. Here:
    * dedup to (user, day) once (one keyed agg over the corpus, the only
    * corpus-sized shuffle), then each user-day CONTRIBUTES itself to the
    * `window` report days it covers (explode ×window of the already tiny
    * user-day table), dedup (user, report_day), and count — linear in
    * |user-days|·window, no per-day rescans. Report days are restricted
    * to observed days (broadcast semi-join with the day set), so a
    * sparse tail never fabricates trailing rows. */
  /** Longest consecutive-day activity streak per key, rolled up to a
    * histogram — the classic gaps-and-islands engagement metric. Island
    * id = day − row_number (constant within a consecutive run), so the
    * whole computation is one keyed window + three keyed aggregations
    * over the deduped user-day table; output is |distinct streak
    * lengths| rows. */
  def streakHistogram(events: DataFrame, keyCol: String = "user_id",
                      tsCol: String = "t_us",
                      dayMicros: Long = 86400000000L): DataFrame = {
    val ud = events
      .select(col(keyCol), expr(s"$tsCol div $dayMicros").as("day"))
      .distinct()
    val grp = col("day") - row_number().over(
      Window.partitionBy(col(keyCol)).orderBy(col("day")))
    ud.withColumn("grp", grp)
      .groupBy(col(keyCol), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col(keyCol)).agg(max(col("len")).as("streak_len"))
      .groupBy(col("streak_len")).agg(count(lit(1)).as("n_users"))
  }

  /** CEP-style guarded sequence match — "target preceded by trigger
    * within `windowUs`, with NO blocker between" (MATCH_RECOGNIZE-lite:
    * the purchase-attributed-to-click-unless-error-intervened shape).
    * One keyed window per key ordered by (ts, id): running MAX of the
    * last trigger/blocker timestamp over the strict-past frame decides
    * each target row locally — never a per-target rescan or a
    * self-join. The id tie-break makes equal-timestamp streams
    * deterministic. Returns per key: targets seen, targets matched. */
  def guardedMatch(events: DataFrame, target: String, trigger: String,
                   blocker: String, windowUs: Long,
                   keyCol: String = "user_id", tsCol: String = "t_us",
                   typeCol: String = "event_type",
                   idCol: String = "event_id"): DataFrame = {
    val past = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("__lt",
        max(when(col(typeCol) === trigger, col(tsCol))).over(past))
      .withColumn("__lb",
        max(when(col(typeCol) === blocker, col(tsCol))).over(past))
      .filter(col(typeCol) === target)
      .withColumn("__m",
        col("__lt").isNotNull &&
          col(tsCol) - col("__lt") <= windowUs &&
          (col("__lb").isNull || col("__lb") <= col("__lt")))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_targets"),
        sum(when(col("__m"), 1L).otherwise(0L)).as("n_matched"))
  }

  /** Survival (churn) sufficient statistics — the Kaplan-Meier inputs
    * over observed user lifetimes: per lifetime age t (days between a
    * user's first and last event), how many users were still AT RISK at
    * t (lifetime ≥ t) and how many ended exactly there. The survival
    * curve S(t) = Π(1 − d_i/n_i) is a ratio PRODUCT — presentation
    * arithmetic; the distributed work is these exact integer counts,
    * and emitting them keeps the result engine-exact where a float
    * product would drift. Plan: one per-user min/max aggregation, one
    * age rollup, and a reverse cumulative window over the age-count
    * table (ages-sized, tiny). */
  def survivalCounts(events: DataFrame, keyCol: String = "user_id",
                     tsCol: String = "t_us",
                     dayMicros: Long = 86400000000L): DataFrame = {
    val lifetimes = events
      .select(col(keyCol), expr(s"$tsCol div $dayMicros").as("day"))
      .groupBy(col(keyCol))
      .agg((max(col("day")) - min(col("day"))).as("age"))
    val ended = lifetimes.groupBy(col("age"))
      .agg(count(lit(1)).as("n_ended"))
    ended.withColumn("n_at_risk", sum(col("n_ended")).over(
      Window.orderBy(col("age").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Session entry→exit paths: how sessions begin and how they end —
    * per (first event type, last event type) pair, the session count
    * ("users who arrive via X mostly leave after Y"). First/last are
    * rank-selected inside the session's existing (ts, id) order, so the
    * whole report rides [[sessionize]]'s single keyed exchange plus one
    * |types|²-bounded aggregation. */
  def sessionPaths(events: DataFrame, keyCol: String, tsCol: String,
                   orderCol: String, typeCol: String,
                   gapMicros: Long): DataFrame = {
    val bySession = Window.partitionBy(col(keyCol), col("session_id"))
    val ordered = bySession.orderBy(col(tsCol), col(orderCol))
    sessionize(events, keyCol, tsCol, orderCol, gapMicros)
      .withColumn("__rn", row_number().over(ordered))
      .withColumn("__n", count(lit(1)).over(bySession))
      .withColumn("__entry",
        max(when(col("__rn") === 1, col(typeCol))).over(bySession))
      .filter(col("__rn") === col("__n"))
      .groupBy(col("__entry").as("entry_type"), col(typeCol).as("exit_type"))
      .agg(count(lit(1)).as("n_sessions"))
  }

  /** Cohort LIFETIME-VALUE curves — [[cohortRetention]]'s revenue
    * sibling: per acquisition cohort (a user's first event day) and
    * cohort age in days, the cohort's value that day and the running
    * cumulative ("how much has the day-X cohort produced by age Y" —
    * the payback-period view). Integer value units in, integer sums
    * out — engine-exact. Plan: one per-user min, one keyed join back,
    * a (cohort, age) aggregation with map-side combine, and a window
    * over cohort-sized groups for the cumulative. */
  def cohortValue(events: DataFrame, keyCol: String = "user_id",
                  tsCol: String = "t_us", valCol: String = "value_c",
                  dayMicros: Long = 86400000000L): DataFrame = {
    val base = events.select(col(keyCol),
      expr(s"$tsCol div $dayMicros").as("day"), col(valCol))
    val cohorts = base.groupBy(col(keyCol))
      .agg(min(col("day")).as("cohort_day"))
    val sizes = cohorts.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_users"))
    val perAge = base.join(cohorts, Seq(keyCol))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age"))
      .agg(sum(col(valCol)).as("revenue"))
    perAge.join(sizes, Seq("cohort_day"))
      .withColumn("cum_revenue", sum(col("revenue")).over(
        Window.partitionBy(col("cohort_day")).orderBy(col("age"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def rollingActive(events: DataFrame, keyCol: String = "user_id",
                    tsCol: String = "t_us", window: Int = 7,
                    dayMicros: Long = 86400000000L): DataFrame = {
    val userDay = events
      .select(col(keyCol), expr(s"$tsCol div $dayMicros").as("day"))
      .distinct()
    val days = userDay.select(col("day")).distinct()
    val dau = userDay.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val rolling = userDay
      .select(col(keyCol),
        explode(sequence(col("day"), col("day") + (window - 1))).as("day"))
      .distinct()
      .join(broadcast(days), Seq("day"), "leftsemi")
      .groupBy(col("day")).agg(count(lit(1)).as("rolling_active"))
    dau.join(rolling, Seq("day"))
  }
}
