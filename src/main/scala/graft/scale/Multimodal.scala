package graft.scale

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside. The Spark-side shape —
  * schema, batched per-partition processing, partition sizing — is real.
  * Two decoders ship:
  *
  *  - [[decodePgm]] — a REAL binary image decoder (Netpbm P5 grayscale:
  *    magic + ASCII header + raster), pure JVM byte parsing, no codec
  *    libraries needed. Exercised end-to-end by the `image_features`
  *    driver query against an arithmetic DuckDB oracle.
  *  - [[decodeStub]] — the stand-in for codecs this container lacks
  *    (JPEG/audio/video); swap in a JNI/FFI codec or a
  *    `mapInPandas`-equivalent batch UDF without touching the pipeline.
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

  /** Encode a grayscale image as binary PGM (P5). `pixel(i)` supplies the
    * row-major raster values in [0, maxval]. */
  def encodePgm(width: Int, height: Int, pixel: Int => Int,
                maxval: Int = 255): Array[Byte] = {
    val header = s"P5\n$width $height\n$maxval\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < width * height) {
      out(header.length + i) = (pixel(i) & 0xff).toByte
      i += 1
    }
    out
  }

  /** REAL decoder for binary PGM (P5): parses the Netpbm header (magic,
    * whitespace-separated width/height/maxval, `#` comments) and folds
    * the raster into (width, height, n_frames=1, mean_luma = mean
    * pixel / maxval). Throws on malformed input — a corrupt payload
    * should surface, not silently skew features. */
  def decodePgm(payload: Array[Byte]): Row = {
    def fail(msg: String) = throw new IllegalArgumentException(s"bad PGM: $msg")
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '5')
      fail("missing P5 magic")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and '#' comments
      var inComment = false
      while (pos < payload.length && {
        val c = payload(pos).toChar
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c.isWhitespace
      }) pos += 1
      val start = pos
      while (pos < payload.length && !payload(pos).toChar.isWhitespace) pos += 1
      if (pos == start) fail("truncated header")
      new String(payload, start, pos - start, "US-ASCII").toInt
    }
    val (w, h, maxval) = (nextInt(), nextInt(), nextInt())
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) fail(s"bad dims $w x $h / $maxval")
    // exactly ONE whitespace byte separates maxval from the raster (the
    // Netpbm spec); anything else (CRLF pair, comment, raster data) means
    // the header parse is off by a byte — fail loudly, a shifted raster
    // start yields silently-wrong features
    if (pos >= payload.length || !payload(pos).toChar.isWhitespace)
      fail("maxval not followed by a whitespace byte")
    pos += 1
    val n = w.toLong * h // Long: huge declared dims must not wrap the check
    // exact-length check: trailing bytes mean the declared dims don't
    // describe this raster (same silent-skew risk as a short raster)
    if (payload.length - pos != n)
      fail(s"raster length ${payload.length - pos} != $n")
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(pos + i.toInt) & 0xff); i += 1 }
    new GenericRowWithSchema(Array[Any](
      w, h, 1, sum.toDouble / n / maxval), featureSchema)
  }

  /** Attach decoded features to rows carrying a binary payload column.
    * Batched per-partition (decoder init amortization point); pass
    * [[decodePgm]] (or a real codec) as `decoder`. Rows with a NULL
    * payload get a NULL features struct — fabricating features for
    * missing media (or crashing the decoder on it) would silently skew
    * downstream statistics. */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload",
                      decoder: Array[Byte] => Row = decodeStub): DataFrame = {
    val schema = df.schema
    val outSchema = StructType(schema.fields :+
      StructField("features", featureSchema, nullable = true))
    val pIdx = schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // real decoders initialize here, once per partition
      rows.map { r =>
        val features =
          if (r.isNullAt(pIdx)) null
          else decoder(r.getAs[Array[Byte]](pIdx))
        new GenericRowWithSchema((r.toSeq :+ features).toArray, outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Deterministic frame sampling plan for video-like payloads: every
    * `stride`-th frame index — pure expression, no decode needed. */
  def sampleFrames(df: DataFrame, nFramesCol: String, stride: Int = 2): DataFrame =
    df.withColumn("sampled_frames",
      when(col(nFramesCol) <= 0, array().cast("array<int>"))
        .otherwise(filter(sequence(lit(0), col(nFramesCol) - 1),
          i => i % stride === 0)))
}
