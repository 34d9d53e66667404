package graft

import org.apache.spark.sql.functions._

import graft.analysis.MotifScan

/** Distance-profile scan: planted motifs score exactly 0, the profile
  * agrees with a local recompute, and gaps/tails are handled. */
class MotifScanSpec extends SparkSpec {
  import spark.implicits._

  private val motif = Array(3.0, 1.0, 4.0, 1.0, 5.0)

  // process 0: motif planted at idx 2 and 10 inside noise; process 1:
  // shorter-than-m series (must produce no windows)
  private def series = {
    val vals0 = Array(9.0, 7.0) ++ motif ++ Array(8.0, 2.0, 6.0) ++ motif ++ Array(4.0)
    val p0 = vals0.zipWithIndex.map { case (v, i) => (0L, i.toLong, v) }
    val p1 = Seq((1L, 0L, 1.0), (1L, 1L, 2.0))
    (p0.toSeq ++ p1).toDF("process", "idx", "value")
  }

  test("planted occurrences score exactly 0; profile matches local recompute") {
    val prof = MotifScan.distanceProfile(series, motif).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val vals0 = Array(9.0, 7.0) ++ motif ++ Array(8.0, 2.0, 6.0) ++ motif ++ Array(4.0)
    val expected = (0 to vals0.length - motif.length).map { s =>
      (0L, s.toLong) -> motif.indices.map(j => math.pow(vals0(s + j) - motif(j), 2)).sum
    }.toMap
    assert(prof == expected)
    assert(prof((0L, 2L)) == 0.0 && prof((0L, 10L)) == 0.0)
    // the short series contributes no window; ragged tails are dropped
    assert(!prof.keys.exists(_._1 == 1L))
    assert(prof.keys.map(_._2).max == (vals0.length - motif.length).toLong)
  }

  test("topOccurrences ranks the planted zeros first, deterministically") {
    val top = MotifScan.topOccurrences(series, motif, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(top == List((0L, 2L, 0.0), (0L, 10L, 0.0)))
  }

  test("occurrencesBelow returns every exact repeat without a k guess") {
    val below = MotifScan.occurrencesBelow(series, motif, 0.0)
    assert(below.columns.toSeq == Seq("process", "start", "dist2"))
    val rows = below.collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 2L), (0L, 10L)))
  }
}
