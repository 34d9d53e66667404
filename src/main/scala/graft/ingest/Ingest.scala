package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types._

/** Shared ingest utilities. */
object Ingest {

  /** Assign a dense 0-based `LongType` id column ordered by `sortCols`,
    * WITHOUT an unpartitioned window.
    *
    * `row_number().over(Window.orderBy(...))` funnels every row through a
    * single task (Spark even warns about it); at trace scale that
    * serializes ingest. Instead: a distributed range-partitioned sort
    * (`orderBy`), then `zipWithIndex` — which runs one lightweight
    * count-per-partition job and adds broadcast partition offsets, keeping
    * parallelism equal to the number of sort partitions.
    *
    * The ids are identical to what the global window would produce
    * (dense, 0-based, ordered by `sortCols`); callers must pass a total
    * order (include a tiebreak column) for deterministic assignment.
    */
  def assignDenseIds(df: DataFrame, idCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    // persist the sorted rows: zipWithIndex's partition-count job and the
    // materializing job would otherwise EACH run the reduce-side sort
    // (doubling the ingest sort stage); the cache is LRU-evicted, and
    // callers persist/write the reader output anyway
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = sortedRdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rows, schema)
  }
}
