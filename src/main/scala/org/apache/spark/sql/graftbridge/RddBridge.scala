package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** InternalRow ⇄ DataFrame bridge (same subpackage convention as
  * [[ColumnBridge]]). `Dataset.rdd` deserializes every row to external
  * objects (`Row`, Scala `Map`s, boxed primitives) and
  * `createDataFrame(RDD[Row], schema)` converts them all back through a
  * reflective converter — for row-shape-preserving transforms like
  * appending a zipWithIndex ordinal, both conversions are pure waste
  * (measured: the OTF2 reader's dense-id pass spent ~100 µs/row in them
  * at sf0.1). These hooks keep the pipeline in Tungsten binary format:
  * `toInternalRdd` exposes the executed plan's UnsafeRows,
  * `fromInternalRdd` wraps an RDD[InternalRow] back without conversion.
  *
  * CONTRACT: rows from `toInternalRdd` are reused per-partition by the
  * scan — `copy()` (or extract the values) before buffering/persisting
  * them. `fromInternalRdd` accepts ANY InternalRow holding catalyst-typed
  * values matching `schema` (UTF8String for strings, MapData/ArrayData
  * for collections, boxed primitives in GenericInternalRow) — the scan
  * node re-projects every row to UnsafeRow, so UnsafeRow-backed input is
  * an optimization, not a requirement (Otf2Reader hands it
  * GenericInternalRow, EventMatcher JoinedRow). */
object RddBridge {
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow],
                      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
