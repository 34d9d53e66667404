package graft.ingest

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas._

/** Charm++ Projections trace reader (SURVEY §2.1 S4;
  * pipit/readers/projections_reader.py:224-800).
  *
  * Layout: `<exe>.sts` text metadata (chares / entry points / user events /
  * stats — projections_reader.py:84-221) plus one gzipped text log per PE
  * (`<exe>.<pe>.log.gz`). The .sts file is tiny → parsed driver-side and
  * broadcast; the per-PE logs are line-oriented → `spark.read.text` (gzip
  * is a non-splittable codec, so one file = one input partition = one PE:
  * exactly the reference's pool-per-PE parallelism, planned by Spark).
  *
  * Record decoding mirrors projections_reader.py:360-790, including its
  * omissions (record type 20 CREATION_BCAST is *not* decoded by the
  * reference, so not by us); timestamps are µs→ns (×1000,
  * projections_reader.py:361). Two reference bugs are fixed rather than
  * reproduced: USER_SUPPLIED_NOTE multiplies a *string* timestamp
  * (py:417-419) and the appended END_COMPUTATION re-multiplies an
  * already-ns timestamp (py:792-795) — we parse ints and append at the
  * last seen ns timestamp.
  *
  * Attributes land in a `Map[String,String]` column plus promoted typed
  * columns (`attr_from_pe`, `attr_msg_length`, `attr_send_time`,
  * `attr_event_id`) per SURVEY §1.4 so comm operators stay columnar.
  */
object ProjectionsReader {

  private[graft] case class StsMeta(
      chares: Map[Int, (String, Int)],
      entries: Map[Int, (String, Int)],
      userEvents: Map[Int, String],
      userStats: Map[Int, String],
      numPes: Int,
      papiEvents: IndexedSeq[String] = IndexedSeq.empty) extends Serializable {
    // pipit projections_reader.py:100-110
    def entryName(id: Int): String = entries.get(id) match {
      case None => ""
      case Some((name, chareId)) => chares.get(chareId) match {
        case Some((chareName, _)) => chareName + "::" + name
        case None => name
      }
    }
    // projections_reader.py:112-126: entry → its chare's dimensions;
    // perf-count arity = #PAPI events when the sts declares them
    def dimension(entry: Int): Int =
      entries.get(entry).flatMap(e => chares.get(e._2)).map(_._2).getOrElse(0)
    def numPerfCounts: Int = papiEvents.length
  }

  private[graft] def parseSts(lines: Iterator[String]): StsMeta = {
    val chares = mutable.Map[Int, (String, Int)]()
    val entries = mutable.Map[Int, (String, Int)]()
    val userEvents = mutable.Map[Int, String]()
    val userStats = mutable.Map[Int, String]()
    var numPes = 0
    var papi = mutable.ArrayBuffer[String]()
    for (line <- lines) {
      val arr = line.trim.split("\\s+").toBuffer
      if (arr.nonEmpty) arr(0) match {
        case "PROCESSORS" => numPes = arr(1).toInt
        case "CHARE" =>
          // CHARE <id> "<name ...>" <dims>
          val id = arr(1).toInt
          val name = arr.slice(2, arr.length - 1).mkString(" ").stripPrefix("\"").stripSuffix("\"")
          chares(id) = (name, arr.last.toInt)
        case "ENTRY" =>
          // ENTRY <kind> <id> "<name ...>" <chare_id> ... (name may contain spaces)
          var i = 3
          while (!arr(i).endsWith("\"")) { arr(i) = arr(i) + " " + arr(i + 1); arr.remove(i + 1) }
          val id = arr(2).toInt
          val name = arr(3).stripPrefix("\"").stripSuffix("\"")
          entries(id) = (name, arr(4).toInt)
        case "EVENT" =>
          userEvents(arr(1).toInt) = arr.drop(2).mkString(" ")
        case "STAT" =>
          userStats(arr(1).toInt) = arr.drop(2).mkString(" ")
        case "TOTAL_PAPI_EVENTS" => // projections_reader.py:210-219
          papi = mutable.ArrayBuffer.fill(arr(1).toInt)("")
        case "PAPI_EVENT" =>
          papi(arr(1).toInt) = arr(2)
        case _ =>
      }
    }
    StsMeta(chares.toMap, entries.toMap, userEvents.toMap, userStats.toMap,
      numPes, papi.toIndexedSeq)
  }

  private val outSchema = StructType(Seq(
    StructField("pe", IntegerType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField(TimestampNs, LongType, nullable = false),
    StructField(EventType, StringType, nullable = false),
    StructField(Name, StringType, nullable = false),
    StructField(Attributes, MapType(StringType, StringType), nullable = true),
    StructField(AttrFromPe, IntegerType, nullable = true),
    StructField(AttrMsgLength, LongType, nullable = true),
    StructField(AttrSendTime, LongType, nullable = true),
    StructField("attr_event_id", LongType, nullable = true)
  ))

  /** Decode one log line into zero or more event rows
    * (pe, seq, ts_ns, type, name, attrs, promoted...). */
  private[graft] def parseLine(meta: StsMeta, pe: Int, seq: Long,
                                line: String): Seq[Row] = {
    val f = line.trim.split("\\s+")
    if (f.isEmpty || !f(0).forall(_.isDigit)) return Nil
    def L(i: Int) = f(i).toLong
    def I(i: Int) = f(i).toInt
    def row(ts: Long, et: String, nm: String, attrs: Map[String, String],
            fromPe: Integer = null, msgLen: java.lang.Long = null,
            sendTime: java.lang.Long = null, eventId: java.lang.Long = null) =
      Row(pe, seq, ts, et, nm, if (attrs == null) null else attrs,
        fromPe, msgLen, sendTime, eventId)

    f(0).toInt match {
      case 1 => // CREATION (py:477-505)
        Seq(row(L(3) * 1000, Instant, meta.entryName(I(2)),
          Map("From PE" -> f(5), "Message Type" -> f(1), "Entry Type" -> "Create",
            "Message Length" -> f(6), "Event ID" -> f(4),
            "Send Time" -> (L(7) * 1000).toString),
          I(5), L(6), L(7) * 1000, L(4)))
      case 21 => // CREATION_MULTICAST (py:507-537)
        Seq(row(L(3) * 1000, Instant, meta.entryName(I(2)),
          Map("From PE" -> f(5), "Message Type" -> f(1), "Entry Type" -> "Multicast",
            "Message Length" -> f(6), "Event ID" -> f(4),
            "Send Time" -> (L(7) * 1000).toString),
          I(5), L(6), L(7) * 1000, L(4)))
      case 2 => // BEGIN_PROCESSING (py:539-578)
        // tail fields: [7]=recv time, [8..8+dims)=object id list,
        // [8+dims]=cpu start time, then one perf count per PAPI event
        val dims = meta.dimension(I(2))
        val idList = (8 until 8 + dims).map(f(_)).mkString("[", ", ", "]")
        val base = Map(
          "From PE" -> f(5), "Message Type" -> f(1), "Entry Type" -> "Processing",
          "Message Length" -> f(6), "Event ID" -> f(4),
          "Receive Time" -> f(7), "ID List" -> idList,
          "CPU Start Time" -> f(8 + dims))
        val attrs =
          if (meta.numPerfCounts == 0) base
          else base + ("perf counts list" ->
            (9 + dims until 9 + dims + meta.numPerfCounts).map(f(_))
              .mkString("[", ", ", "]"))
        Seq(row(L(3) * 1000, Enter, meta.entryName(I(2)), attrs,
          I(5), L(6), null, L(4)))
      case 3 => // END_PROCESSING — attrs None in reference (py:580-608)
        Seq(row(L(3) * 1000, Leave, meta.entryName(I(2)), null))
      case 6 => Seq(row(L(1) * 1000, Enter, "Computation", null))
      case 7 => Seq(row(L(1) * 1000, Leave, "Computation", null))
      case 11 => Seq(row(L(1) * 1000, Enter, "Trace", null))
      case 12 => Seq(row(L(1) * 1000, Leave, "Trace", null))
      case 14 => Seq(row(L(1) * 1000, Enter, "Idle", Map("From PE" -> f(2)), I(2)))
      case 15 => Seq(row(L(1) * 1000, Leave, "Idle", Map("From PE" -> f(2)), I(2)))
      case 16 => Seq(row(L(1) * 1000, Enter, "Pack", Map("From PE" -> f(2)), I(2)))
      case 17 => Seq(row(L(1) * 1000, Leave, "Pack", Map("From PE" -> f(2)), I(2)))
      case 18 => Seq(row(L(1) * 1000, Enter, "Unpack", Map("From PE" -> f(2)), I(2)))
      case 19 => Seq(row(L(1) * 1000, Leave, "Unpack", Map("From PE" -> f(2)), I(2)))
      case 10 => // MESSAGE_RECV (py:662-681)
        Seq(row(L(2) * 1000, Instant, "Message Receive",
          Map("From PE" -> f(4), "Message Type" -> f(1), "Message Length" -> f(5),
            "Event ID" -> f(3)), I(4), L(5), null, L(3)))
      case 4 => // ENQUEUE (py:683-691)
        Seq(row(L(2) * 1000, Instant, "Enque",
          Map("From PE" -> f(4), "Message Type" -> f(1), "Event ID" -> f(3)),
          I(4), null, null, L(3)))
      case 5 =>
        Seq(row(L(2) * 1000, Instant, "Deque",
          Map("From PE" -> f(4), "Message Type" -> f(1), "Event ID" -> f(3)),
          I(4), null, null, L(3)))
      case 8 =>
        Seq(row(L(1) * 1000, Enter, "Interrupt",
          Map("From PE" -> f(3), "Event ID" -> f(2)), I(3), null, null, L(2)))
      case 9 =>
        Seq(row(L(1) * 1000, Leave, "Interrupt",
          Map("From PE" -> f(3), "Event ID" -> f(2)), I(3), null, null, L(2)))
      case 13 => // USER_EVENT (py:703-721)
        Seq(row(L(2) * 1000, Instant, meta.userEvents.getOrElse(I(1), ""),
          Map("From PE" -> f(4), "Event ID" -> f(3), "Event Type" -> "User Event"),
          I(4), null, null, L(3)))
      case 100 => // USER_EVENT_PAIR
        Seq(row(L(2) * 1000, Instant, meta.userEvents.getOrElse(I(1), ""),
          Map("From PE" -> f(4), "Event ID" -> f(3), "Nested ID" -> f(5),
            "Event Type" -> "User Event Pair"), I(4), null, null, L(3)))
      case 98 =>
        Seq(row(L(2) * 1000, Enter, "User Event Pair",
          Map("From PE" -> f(4), "Event ID" -> f(3), "Nested ID" -> f(5)),
          I(4), null, null, L(3)))
      case 99 =>
        Seq(row(L(2) * 1000, Leave, "User Event Pair",
          Map("From PE" -> f(4), "Event ID" -> f(3), "Nested ID" -> f(5)),
          I(4), null, null, L(3)))
      case 26 => // USER_SUPPLIED — reference keeps ts = -1 (py:408-415)
        Seq(row(-1L, Instant, "User Supplied", Map("User Supplied" -> f(1))))
      case 28 => // USER_SUPPLIED_NOTE (reference string-mult bug fixed)
        Seq(row(L(1) * 1000, Instant, "User Supplied Note",
          Map("Note" -> f.drop(2).mkString(" "))))
      case 29 => // USER_SUPPLIED_BRACKETED_NOTE → Enter + Leave (py:431-465)
        val attrs = Map("Event ID" -> f(3), "Note" -> f.drop(4).mkString(" "))
        Seq(row(L(1) * 1000, Enter, "User Supplied Bracketed Note", attrs),
          row(L(2) * 1000, Leave, "User Supplied Bracketed Note", attrs))
      case 27 => // MEMORY_USAGE
        Seq(row(L(2) * 1000, Instant, "Memory Usage", Map("Memory Usage" -> f(1))))
      case 32 => // USER_STAT
        Seq(row(L(1) * 1000, Instant, meta.userStats.getOrElse(I(5), ""),
          Map("From PE" -> f(4), "User Time" -> (L(2) * 1000).toString,
            "Stat" -> f(3)), I(4)))
      case _ => Nil
    }
  }

  /** Read a Projections trace directory into canonical events. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val fs = new java.io.File(dir)
    val stsFile = fs.listFiles().find(_.getName.endsWith(".sts"))
      .getOrElse(throw new IllegalArgumentException(s"no .sts file in $dir"))
    val src = scala.io.Source.fromFile(stsFile)
    val meta = try parseSts(src.getLines()) finally src.close()
    val metaBc = spark.sparkContext.broadcast(meta)

    val logPattern = """.*\.(\d+)\.log\.gz$""".r
    val logFiles = fs.listFiles().map(_.getPath).filter(logPattern.matches(_))
    require(logFiles.nonEmpty, s"no .log.gz files in $dir")

    val lines = spark.read.text(logFiles.toIndexedSeq: _*)
      .select(col("value"), input_file_name().as("file"))

    // per-file line sequence: gzip files are unsplittable, so each file is
    // contiguous within a partition; a per-partition counter that resets on
    // file change reproduces file order
    val parsed = lines.mapPartitions { it =>
      var currentFile: String = null
      var seq = 0L
      it.flatMap { r =>
        val file = r.getString(1)
        if (file != currentFile) { currentFile = file; seq = 0L }
        seq += 1
        val pe = file match {
          case logPattern(n) => n.toInt
          case _ => -1
        }
        parseLine(metaBc.value, pe, seq, r.getString(0))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))

    // append a Computation Leave when a PE's log doesn't end with one
    // (reference py:792-795, at the PE's last seen timestamp)
    val lastPerPe = parsed
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("pe")).orderBy(col("seq").desc, col(TimestampNs).desc)))
      .filter(col("rn") === 1)
      .filter(col(Name) =!= "Computation")
      .select(col("pe"), col("seq") + 1, col(TimestampNs), lit(Leave).as(EventType),
        lit("Computation").as(Name), lit(null).cast(outSchema(Attributes).dataType).as(Attributes),
        lit(null).cast(IntegerType), lit(null).cast(LongType), lit(null).cast(LongType),
        lit(null).cast(LongType))

    val all = parsed.unionByName(lastPerPe.toDF(parsed.columns.toIndexedSeq: _*))
    Ingest.assignDenseIds(all, EventId, col(TimestampNs), col("pe"), col("seq"))
      .select(col(EventId), col(TimestampNs), col(EventType), col(Name),
        col("pe").cast(IntegerType).as(Process), col(Attributes),
        col(AttrFromPe), col(AttrMsgLength), col(AttrSendTime), col("attr_event_id"))
  }
}
