package graft

import org.apache.spark.sql.functions._
import graft.analysis.AsOfJoin

/** Backward as-of join semantics: inclusive equality, latest-preceding
  * selection, highest-right-id tie-break, left-outer nulls, and key
  * isolation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long, Double)]) = {
    val l = left.toDF("event_id", "k", "t")
    val r = right.toDF("event_id", "k", "t", "v")
    AsOfJoin.asOfBackward(l, r, Seq("k"), "t", "t", "event_id",
        Seq("event_id" -> "r_id", "t" -> "r_t", "v" -> "r_v"))
      .select(col("event_id"), col("r_id").cast("long"), col("r_v"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) -1L else x.getLong(1),
        if (x.isNullAt(2)) -999.0 else x.getDouble(2)))
      .sortBy(_._1).toSeq
  }

  test("picks the latest right row at or before each left row, per key") {
    val out = run(
      left = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 8L, 100L)),
      right = Seq((10L, 7L, 50L, 1.0), (11L, 7L, 200L, 2.0), (12L, 8L, 150L, 3.0)))
    // left 1: only t=50 precedes; left 2: t=200 is latest; left 3 (key 8):
    // right t=150 is AFTER it -> null (key isolation: key 7 rows invisible)
    assert(out == Seq((1L, 10L, 1.0), (2L, 11L, 2.0), (3L, -1L, -999.0)))
  }

  test("equal timestamps: right row at left.ts is visible (inclusive)") {
    val out = run(Seq((1L, 7L, 100L)), Seq((10L, 7L, 100L, 5.0)))
    assert(out == Seq((1L, 10L, 5.0)))
  }

  test("right-side ts ties resolve to the highest right id") {
    val out = run(Seq((1L, 7L, 300L)),
      Seq((10L, 7L, 200L, 1.0), (12L, 7L, 200L, 3.0), (11L, 7L, 200L, 2.0)))
    assert(out == Seq((1L, 12L, 3.0)))
  }

  test("all carried fields come from the SAME latest right row, even nulls") {
    import org.apache.spark.sql.functions._
    val l = Seq((1L, 7L, 300L)).toDF("event_id", "k", "t")
    val r = Seq((10L, 7L, 100L, Some(5.0)), (20L, 7L, 200L, None))
      .toDF("event_id", "k", "t", "v")
    val out = AsOfJoin.asOfBackward(l, r, Seq("k"), "t", "t", "event_id",
        Seq("event_id" -> "r_id", "v" -> "r_v"))
      .select(col("r_id"), col("r_v")).head()
    // latest right row is id 20 with v = NULL: r_v must be NULL, not the
    // older row's 5.0 (per-column forward-fill would mix rows)
    assert(out.getLong(0) == 20L && out.isNullAt(1))
  }

  test("carry names colliding with left columns are rejected") {
    val l = Seq((1L, 7L, 300L, 9.9)).toDF("event_id", "k", "t", "value")
    val r = Seq((10L, 7L, 100L, 5.0)).toDF("event_id", "k", "t", "value")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(l, r, Seq("k"), "t", "t", "event_id",
        Seq("value" -> "value"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("matches the naive max-preceding formulation on pseudo-random data") {
    import org.apache.spark.sql.functions._
    val l = (0 until 300).map(i =>
      (i.toLong, (i * 7 % 5).toLong, (i * 131 % 997).toLong))
      .toDF("event_id", "k", "t")
    val r = (1000 until 1100).map(i =>
      (i.toLong, (i * 3 % 5).toLong, (i * 239 % 997).toLong, i * 0.5))
      .toDF("event_id", "k", "t", "v")
    val ours = AsOfJoin.asOfBackward(l, r, Seq("k"), "t", "t", "event_id",
        Seq("event_id" -> "r_id"))
      .select(col("event_id"), col("r_id"))
    // naive: theta join + argmax of (right ts, right id) per left row
    val naive = l.join(
        r.select(col("event_id").as("rid"), col("k"), col("t").as("rt")),
        Seq("k"))
      .filter(col("rt") <= col("t"))
      .groupBy(col("event_id"))
      .agg(max(struct(col("rt"), col("rid"))).getField("rid").as("r_id"))
    val fullOurs = ours.filter(col("r_id").isNotNull)
    assert(fullOurs.exceptAll(naive).isEmpty && naive.exceptAll(fullOurs).isEmpty)
    assert(ours.count() == 300) // unmatched lefts kept as nulls
  }

  test("left rows keep all their columns and multiplicity") {
    val l = Seq((1L, 7L, 100L, "a"), (2L, 7L, 100L, "b"))
      .toDF("event_id", "k", "t", "payload")
    val r = Seq((10L, 7L, 90L, 1.0)).toDF("event_id", "k", "t", "v")
    val out = AsOfJoin.asOfBackward(l, r, Seq("k"), "t", "t", "event_id",
      Seq("event_id" -> "r_id"))
    assert(out.columns.toSeq == Seq("event_id", "k", "t", "payload", "r_id"))
    // two left rows at the same ts both match independently
    assert(out.count() == 2)
    assert(out.select("r_id").as[Long].collect().toSeq == Seq(10L, 10L))
  }

  private def runFwd(left: Seq[(Long, Long, Long)],
                     right: Seq[(Long, Long, Long, Double)]) = {
    val l = left.toDF("event_id", "k", "t")
    val r = right.toDF("event_id", "k", "t", "v")
    AsOfJoin.asOfForward(l, r, Seq("k"), "t", "t", "event_id",
        Seq("event_id" -> "r_id", "t" -> "r_t", "v" -> "r_v"))
      .select(col("event_id"), col("r_id").cast("long"), col("r_v"))
      .collect().map(x => (x.getLong(0),
        if (x.isNullAt(1)) -1L else x.getLong(1),
        if (x.isNullAt(2)) -999.0 else x.getDouble(2)))
      .sortBy(_._1).toSeq
  }

  test("forward: picks the earliest right row at or after, inclusive ties to smallest id") {
    val out = runFwd(
      left = Seq((1L, 7L, 100L), (2L, 7L, 250L), (3L, 8L, 200L)),
      right = Seq((10L, 7L, 50L, 1.0), (11L, 7L, 200L, 2.0), (12L, 8L, 150L, 3.0)))
    // left 1 → next right at 200; left 2 → nothing after → null;
    // left 3 (key 8) → right 150 is BEFORE it → null
    assert(out == Seq((1L, 11L, 2.0), (2L, -1L, -999.0), (3L, -1L, -999.0)))
    // inclusive equality + smallest-id tie-break
    val eq = runFwd(Seq((1L, 7L, 100L)),
      Seq((12L, 7L, 100L, 3.0), (10L, 7L, 100L, 1.0)))
    assert(eq == Seq((1L, 10L, 1.0)))
  }

  test("forward matches the naive min-following formulation on pseudo-random data") {
    val rng = new scala.util.Random(41)
    val l = Seq.tabulate(200)(i => (i.toLong, rng.nextInt(5).toLong,
      rng.nextInt(1000).toLong))
    val r = Seq.tabulate(300)(i => (1000L + i, rng.nextInt(5).toLong,
      rng.nextInt(1000).toLong, rng.nextDouble()))
    val got = runFwd(l, r).map { case (a, b, c) => a -> ((b, c)) }.toMap
    val naive = l.map { case (id, k, t) =>
      val cands = r.filter(x => x._2 == k && x._3 >= t)
      if (cands.isEmpty) id -> ((-1L, -999.0))
      else {
        val best = cands.minBy(x => (x._3, x._1))
        id -> ((best._1, best._4))
      }
    }.toMap
    assert(got == naive)
  }
}
