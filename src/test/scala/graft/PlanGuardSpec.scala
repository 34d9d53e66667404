package graft

/** Plan-shape regression guard over the ENTIRE query registry: the
  * scale-killers the round-1 review flagged must never reappear.
  *
  *  - No CartesianProduct anywhere (non-equi joins must be broadcast
  *    or decomposed — e.g. RangeJoin's binning; an accidental cartesian
  *    on two corpus-sized sides is the classic silent scale-killer).
  *  - No single-partition window Exchange in any reader output
  *    (event_id assignment must stay distributed — Ingest.assignDenseIds).
  */
class PlanGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("filters and column pruning reach the parquet scans") {
    // q1_pricing: the lineitem scan must read ONLY the columns the
    // aggregate touches — a scan of the full schema for a 5-column
    // aggregate is reading ~2× the bytes at 100 TB.
    val q1 = SparkEntry.queries("q1_pricing")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(q1).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"),
      s"scan reads untouched columns: $readSchema")

    // q3_topk: the customer mktsegment predicate must reach the scan
    // as a pushed parquet filter, not a post-scan Filter over all rows
    val q3 = SparkEntry.queries("q3_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q3.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      s"mktsegment not pushed to the customer scan:\n${q3.take(1500)}")

    // comm_matrix derives its comm attributes from (user_id, event_type,
    // value, props) — the scan must prune the UNUSED events columns
    // (event_id, ts), proving pruning pierces the commTrace projection
    val cm = SparkEntry.queries("comm_matrix")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val cmSchema = "ReadSchema: [^\n]*".r.findFirstIn(cm).getOrElse("")
    assert(!cmSchema.contains("event_id") && !cmSchema.contains("ts:"),
      s"comm_matrix scan reads unused columns: $cmSchema")
  }

  test("every unpartitioned window sits above an aggregation/limit " +
      "(plan-bounded input) — registry-wide") {
    // An unpartitioned window is a single-task collapse. That's benign
    // over a post-aggregation bin/report table (bounded rows) and a
    // scale-killer over a corpus-sized table. Tripwire: below every
    // zero-partition logical Window, EVERY input branch must pass
    // through an Aggregate / Limit / local relation before any source
    // relation — so a new query can't silently add a corpus-wide
    // single-task sort.
    import org.apache.spark.sql.catalyst.plans.logical._
    def bounded(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit | _: LocalRelation
           | _: OneRowRelation => true
      // a bounded-input window stays bounded; dedup collapses like agg
      case d: Distinct => bounded(d.child)
      case _ if p.children.isEmpty => false
      case j: Join => // a join is bounded only if BOTH sides are
        j.children.forall(bounded)
      case _ => p.children.forall(bounded)
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        val bad = plan.collect {
          case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) => w
        }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned window over unbounded input in: ${offenders.mkString(", ")}")
    // guard of the guard: a corpus-wide unpartitioned window MUST trip
    val bad = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
      .queryExecution.optimizedPlan
    assert(bad.collect {
      case w: Window if w.partitionSpec.isEmpty && !bounded(w.child) => w
    }.nonEmpty, "the tripwire failed to flag a corpus-wide window")
  }

  test("reader event-id assignment stays distributed (no global window)") {
    import spark.implicits._
    val csv = graft.ingest.CsvReader.read(spark, resourcePath("foo-bar.csv"))
    val nsight = graft.ingest.NsightReader.fromIntervals(
      Seq(("kern", 0L, 10L, 100L, 1L), ("kern", 5L, 9L, 100L, 2L))
        .toDF("name", "start_ns", "end_ns", "pid", "tid"))
    Seq(csv, nsight).foreach { ev =>
      val plan = ev.queryExecution.executedPlan.toString
      assert(!(plan.contains("Window") && plan.contains("SinglePartition")),
        s"single-partition window in reader plan:\n${plan.take(2000)}")
    }
  }
}
