package graft.analysis

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Global 2-D skyline (Pareto frontier, maximize both dimensions):
  * the points not strictly dominated by any other point — q dominates p
  * iff q.x >= p.x, q.y >= p.y and q != p (on the DISTINCT point set).
  *
  * Distributed formulation: after deduplication, range-sort the points
  * by (x desc, y desc). In that order a point is on the skyline iff its
  * y strictly exceeds the maximum y of ALL earlier points — earlier
  * rows are exactly those with larger x, or equal x and larger y, i.e.
  * the potential dominators. The global running maximum is computed
  * without a single-partition window: one tiny job collects each
  * sorted partition's max y, the driver prefix-scans those (#partitions
  * values), and a second pass seeds every partition's scan with the
  * broadcast prefix — the same two-job scheme as
  * [[graft.ingest.Ingest.assignDenseIds]]. Work is O(n log n) in the
  * sort; the driver handles #partitions numbers, never points. The
  * naive NOT EXISTS dominance anti-join is O(n²) and unusable at scale
  * (it survives only in the DuckDB oracle at test SF).
  */
object Skyline {

  /** @return the skyline points as (xCol, yCol), both cast to long. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val pts = df
      .select(col(xCol).cast("long").as(xCol), col(yCol).cast("long").as(yCol))
      .distinct()
      .orderBy(col(xCol).desc, col(yCol).desc)
    val rdd = pts.rdd.map(r => (r.getLong(0), r.getLong(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val partMax = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var m = Long.MinValue
        it.foreach(p => if (p._2 > m) m = p._2)
        Iterator((i, m))
      }
      .collect().sortBy(_._1).map(_._2)
    // prefix(i) = max y over all partitions before i (MinValue for i=0)
    val prefix = partMax.scanLeft(Long.MinValue)(math.max).init
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var m = prefix(i)
      it.flatMap { case (x, y) =>
        if (y > m) { m = y; Some(Row(x, y)) } else None
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField(xCol, LongType, nullable = false),
      StructField(yCol, LongType, nullable = false))))
  }
}
