package graft.scale

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside. The Spark-side shape —
  * schema, batched per-partition processing, partition sizing — is real;
  * the actual media decode is STUBBED (`decodeStub`): this container has
  * no image/audio codecs, so the stub derives deterministic fake features
  * from the bytes. Swap `decodeStub` for a real codec (JNI/FFI or a
  * `mapInPandas`-equivalent batch UDF in PySpark) without touching the
  * pipeline shape.
  *
  * Scale notes: payloads are processed with `mapPartitions` so a real
  * decoder amortizes model/codec init per partition (the same reason
  * PySpark uses mapInPandas); binary columns should be stored in their own
  * parquet column chunk — metadata-only queries then never read the bytes
  * (column pruning).
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)
  ))

  /** STUB decoder: deterministic fake features from payload bytes.
    * A real implementation would decode the media here. */
  def decodeStub(payload: Array[Byte]): Row = {
    val n = payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xff); i += 1 }
    new GenericRowWithSchema(Array[Any](
      640 + (n % 640), 360 + (n % 360), 1 + (n % 16),
      if (n == 0) 0.0 else sum.toDouble / n / 255.0
    ), featureSchema)
  }

  /** Attach decoded features to rows carrying a binary payload column.
    * Batched per-partition (decoder init amortization point). */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema
    val outSchema = StructType(schema.fields :+ StructField("features", featureSchema))
    val pIdx = schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // real decoders initialize here, once per partition
      rows.map { r =>
        val payload = if (r.isNullAt(pIdx)) Array.emptyByteArray
                      else r.getAs[Array[Byte]](pIdx)
        new GenericRowWithSchema((r.toSeq :+ decodeStub(payload)).toArray, outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic frame sampling plan for video-like payloads: every
    * `stride`-th frame index — pure expression, no decode needed. */
  def sampleFrames(df: DataFrame, nFramesCol: String, stride: Int = 2): DataFrame =
    df.withColumn("sampled_frames",
      filter(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0))),
        i => i % stride === 0))
}
