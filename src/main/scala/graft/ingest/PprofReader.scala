package graft.ingest

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** pprof profile source — the protobuf format Go's runtime/pprof,
  * Java async-profiler, and py-spy all export. Parsed from scratch
  * (varint + length-delimited wire format, the only two wire types
  * profile.proto uses; optional gzip layer via java.util.zip) — no
  * protobuf runtime needed, same zero-native-deps stance as the OTF2
  * and HPCToolkit binary decoders.
  *
  * Scale shape: ONE pprof blob is one process's profile — the 100 TB
  * case is millions of per-host/per-minute blobs riding a binary
  * column. [[samples]] decodes per-row inside mapPartitions and emits
  * one row per (sample leaf frame), so a fleet-wide flat profile is a
  * decode + groupBy — no driver-side parsing of anything.
  *
  * Field numbers from the public profile.proto: Profile{sample_type=1,
  * sample=2, location=4, function=5, string_table=6}, Sample
  * {location_id=1 (packed), value=2 (packed)}, Location{id=1, line=4},
  * Line{function_id=1}, Function{id=1, name=2 (strtab)}. Unknown
  * fields are skipped by wire type, so real-world profiles with
  * mappings/labels/comments parse fine. */
object PprofReader {

  val sampleSchema: StructType = StructType(Seq(
    StructField("leaf_function", StringType, nullable = false),
    StructField("root_function", StringType, nullable = false),
    StructField("stack_depth", IntegerType, nullable = false),
    StructField("value", LongType, nullable = false),
    // root-first ";"-joined frames — flamegraph.pl's folded format, so
    // `groupBy(stack_folded).sum(value)` IS a flame graph input file
    StructField("stack_folded", StringType, nullable = false)))

  // ---- wire-format primitives -------------------------------------

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        // bound against THIS reader's end: a truncated/corrupt
        // length-delimited field must throw, not silently read into the
        // bytes of the field that follows it
        if (pos >= end)
          throw new IllegalArgumentException("bad pprof: varint past field end")
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("bad pprof: varint overflow")
      }
      v
    }
    /** (fieldNumber, wireType); returns (-1, -1) at end */
    def tag(): (Int, Int) = {
      if (!hasMore) return (-1, -1)
      val t = varint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    private def advance(n: Int): Unit = {
      if (n < 0 || pos + n > end)
        throw new IllegalArgumentException(
          s"bad pprof: field of $n bytes exceeds enclosing message")
      pos += n
    }
    def lenDelim(): Reader = {
      val n = varint().toInt
      val start = pos
      advance(n)
      new Reader(buf, start, start + n)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(): Unit
      case 1 => advance(8)
      case 2 => advance(varint().toInt)
      case 5 => advance(4)
      case w => throw new IllegalArgumentException(s"bad pprof: wire type $w")
    }
    def bytes(): Array[Byte] = java.util.Arrays.copyOfRange(buf, pos, end)
    /** packed OR single scalar for a repeated varint field */
    def repeatedVarints(wireType: Int, into: mutable.ArrayBuffer[Long]): Unit =
      if (wireType == 2) { val r = lenDelim(); while (r.hasMore) into += r.varint() }
      else into += varint()
  }

  private def gunzipIfNeeded(payload: Array[Byte]): Array[Byte] =
    if (payload.length > 2 && (payload(0) & 0xff) == 0x1f && (payload(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(payload))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } else payload

  // ---- decode ------------------------------------------------------

  /** Decode one profile blob to per-sample rows (leaf frame, root
    * frame, depth, first value). Throws on malformed input. */
  def decodeSamples(payload: Array[Byte]): Seq[Row] = {
    val raw = gunzipIfNeeded(payload)
    val top = new Reader(raw, 0, raw.length)
    val strings = mutable.ArrayBuffer[String]()
    val locToFn = mutable.Map[Long, Long]()     // location id → leaf function id
    val fnName = mutable.Map[Long, Long]()      // function id → strtab idx
    case class Samp(locs: Seq[Long], value: Long)
    val samples = mutable.ArrayBuffer[Samp]()

    var t = top.tag()
    while (t._1 >= 0) {
      t match {
        case (2, 2) => // Sample
          val r = top.lenDelim()
          val locs = mutable.ArrayBuffer[Long]()
          val vals = mutable.ArrayBuffer[Long]()
          var st = r.tag()
          while (st._1 >= 0) {
            st match {
              case (1, w) => r.repeatedVarints(w, locs)
              case (2, w) => r.repeatedVarints(w, vals)
              case (_, w) => r.skip(w)
            }
            st = r.tag()
          }
          if (locs.nonEmpty && vals.nonEmpty)
            samples += Samp(locs.toSeq, vals.head)
        case (4, 2) => // Location
          val r = top.lenDelim()
          var id = -1L; var fn = -1L
          var st = r.tag()
          while (st._1 >= 0) {
            st match {
              case (1, _) => id = r.varint()
              case (4, 2) => // Line: first line's function_id wins
                val lr = r.lenDelim()
                var lt = lr.tag()
                while (lt._1 >= 0) {
                  lt match {
                    case (1, _) => if (fn < 0) fn = lr.varint() else lr.skip(0)
                    case (_, w) => lr.skip(w)
                  }
                  lt = lr.tag()
                }
              case (_, w) => r.skip(w)
            }
            st = r.tag()
          }
          if (id >= 0 && fn >= 0) locToFn(id) = fn
        case (5, 2) => // Function
          val r = top.lenDelim()
          var id = -1L; var name = -1L
          var st = r.tag()
          while (st._1 >= 0) {
            st match {
              case (1, _) => id = r.varint()
              case (2, _) => name = r.varint()
              case (_, w) => r.skip(w)
            }
            st = r.tag()
          }
          if (id >= 0 && name >= 0) fnName(id) = name
        case (6, 2) => // string_table entry
          strings += new String(top.lenDelim().bytes(), "UTF-8")
        case (_, w) => top.skip(w)
      }
      t = top.tag()
    }

    def nameOf(loc: Long): String = {
      val fn = locToFn.getOrElse(loc,
        throw new IllegalArgumentException(s"bad pprof: unknown location $loc"))
      val idx = fnName.getOrElse(fn,
        throw new IllegalArgumentException(s"bad pprof: unknown function $fn")).toInt
      if (idx < 0 || idx >= strings.length)
        throw new IllegalArgumentException(s"bad pprof: string index $idx")
      strings(idx)
    }
    samples.toSeq.map { s =>
      // pprof convention: location_id[0] is the LEAF, last is the root
      new GenericRowWithSchema(Array[Any](
        nameOf(s.locs.head), nameOf(s.locs.last), s.locs.length, s.value,
        s.locs.reverse.map(nameOf).mkString(";")),
        sampleSchema): Row
    }
  }

  /** Explode a binary column of pprof blobs into per-sample rows,
    * decoded inside mapPartitions — the fleet-scale ingest shape. Null
    * payloads yield no rows. */
  def samples(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema
    val keep = schema.fields.filterNot(_.name == payloadCol)
    val outSchema = StructType(keep ++ sampleSchema.fields)
    val pIdx = schema.fieldIndex(payloadCol)
    val keepIdx = keep.map(f => schema.fieldIndex(f.name))
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.isNullAt(pIdx)) Iterator.empty
        else {
          val prefix = keepIdx.map(r.get)
          decodeSamples(r.getAs[Array[Byte]](pIdx)).iterator.map { s =>
            new GenericRowWithSchema(prefix ++ s.toSeq, outSchema): Row
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  // ---- encode (tests / synthetic fixtures) -------------------------

  /** Minimal valid profile builder: functions indexed 1..names.size,
    * one location per function, samples as (stack of function ids
    * leaf-first, value). Set `gzip = true` to exercise the gzip path. */
  def encode(names: Seq[String], samples: Seq[(Seq[Int], Long)],
             gzip: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def vint(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      o.write(v.toInt)
    }
    def field(o: java.io.ByteArrayOutputStream, num: Int, wt: Int): Unit =
      vint(o, (num.toLong << 3) | wt)
    def lenDelim(num: Int)(body: java.io.ByteArrayOutputStream => Unit): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      field(out, num, 2); vint(out, b.size.toLong); b.writeTo(out)
    }
    def packed(o: java.io.ByteArrayOutputStream, num: Int, vs: Seq[Long]): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      vs.foreach(vint(b, _))
      field(o, num, 2); vint(o, b.size.toLong); b.writeTo(o)
    }
    // string table: "" at 0, then "samples", "count", then names
    val strings = "" +: "samples" +: "count" +: names
    // sample_type { type: 1 ("samples"), unit: 2 ("count") }
    lenDelim(1) { b => field(b, 1, 0); vint(b, 1L); field(b, 2, 0); vint(b, 2L) }
    samples.foreach { case (stack, v) =>
      lenDelim(2) { b =>
        packed(b, 1, stack.map(_.toLong)) // location ids = function ids here
        packed(b, 2, Seq(v))
      }
    }
    names.indices.foreach { i =>
      val id = (i + 1).toLong
      lenDelim(4) { b => // Location{id, Line{function_id}}
        field(b, 1, 0); vint(b, id)
        val lb = new java.io.ByteArrayOutputStream()
        field(lb, 1, 0); vint(lb, id)
        field(b, 4, 2); vint(b, lb.size.toLong); lb.writeTo(b)
      }
      lenDelim(5) { b => // Function{id, name strtab idx}
        field(b, 1, 0); vint(b, id)
        field(b, 2, 0); vint(b, (3 + i).toLong)
      }
    }
    strings.foreach { s =>
      lenDelim(6)(b => b.write(s.getBytes("UTF-8")))
    }
    val bytes = out.toByteArray
    if (!gzip) bytes
    else {
      val bo = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bo)
      gz.write(bytes); gz.close()
      bo.toByteArray
    }
  }
}
