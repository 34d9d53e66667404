package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas._

/** HPCToolkit database reader (SURVEY §2.1 S3;
  * pipit/readers/hpctoolkit_reader.py:12-1378).
  *
  * Format: `meta.db` (common strings / load modules / source files /
  * functions / context tree), `profile.db` (per-profile hierarchical
  * identifier tuples → RANK/THREAD/NODE/CORE), `trace.db` (per-thread
  * trace lines of (timestamp, context-id) samples). All little-endian
  * "HPCTOOLKIT" v4 containers with a (size, pointer) section table.
  *
  * The interesting part is event *reconstruction*
  * (hpctoolkit_reader.py:1208-1305): consecutive samples are call-stack
  * leaves; walking from the previous context to the least-common-ancestor
  * emits Leave events up, then Enter events down to the new context.
  * Contexts of lexical type line/instruction collapse into their enclosing
  * function node (py:735-741); loop constructs emit `Loop Enter`/`Loop
  * Leave` with name "loop" (py:145-148,1252-1256). Open frames close at
  * max-timestamp (py:1307-1337). Timestamps are normalized to
  * ns-since-trace-start.
  *
  * Spark shape: meta/profile are small dimensions → parsed on the driver
  * and broadcast; trace lines are the data → one Spark task per trace line
  * (the natural sharding: the reconstruction walk is inherently sequential
  * *within* a line, embarrassingly parallel across lines), each task
  * reading only its line's byte range. Driver memory is O(CCT), executor
  * memory is O(call depth).
  */
object HpctoolkitReader {

  // ---- binary helpers -------------------------------------------------

  private class Db(path: String, magic: String, nSections: Int) {
    val bytes: Array[Byte] = Files.readAllBytes(Paths.get(path))
    val buf: ByteBuffer = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(new String(bytes, 0, 10, "ASCII") == "HPCTOOLKIT", s"bad magic in $path")
    require(new String(bytes, 10, 4, "ASCII") == magic, s"expected $magic section in $path")
    // common header: 10B magic + 4B format + 2B version, then (u64 size, u64 ptr)*
    val sections: IndexedSeq[(Long, Long)] = (0 until nSections).map { i =>
      (buf.getLong(16 + i * 16), buf.getLong(16 + i * 16 + 8))
    }
    def u16(p: Long): Int = buf.getShort(p.toInt) & 0xffff
    def u32(p: Long): Long = buf.getInt(p.toInt) & 0xffffffffL
    def u64(p: Long): Long = buf.getLong(p.toInt)
    def u8(p: Long): Int = buf.get(p.toInt) & 0xff
    def cString(p: Long): String = {
      var e = p.toInt
      while (bytes(e) != 0) e += 1
      new String(bytes, p.toInt, e - p.toInt, "UTF-8")
    }
  }

  // ---- meta.db --------------------------------------------------------

  /** Per-context info needed for reconstruction, keyed by context id of the
    * *node-bearing* contexts (line/instruction contexts collapse away). */
  case class CtxInfo(name: String, file: String, line: Int, loopType: Boolean,
                     parent: Long, level: Int) extends Serializable

  case class Meta(
      // sample ctx id → node-bearing ctx id ("node_map" in the reference)
      nodeOf: Map[Long, Long],
      // node-bearing ctx id → info (incl. parent node ctx id, -1 at root)
      ctx: Map[Long, CtxInfo]) extends Serializable

  private def parseMeta(db: Db): Meta = {
    // sections: 0 General, 1 IdNames, 2 Metrics, 3 ContextTree, 4 Strings,
    //           5 LoadModules, 6 SourceFiles, 7 Functions
    val (_, strPtr) = db.sections(4)

    val (_, sfSecPtr) = db.sections(6)
    val sfArr = db.u64(sfSecPtr); val nSf = db.u32(sfSecPtr + 8); val sfSz = db.u16(sfSecPtr + 12)
    def sfIndex(p: Long): Int = ((p - sfArr) / sfSz).toInt
    val sourceFiles: IndexedSeq[String] =
      (0 until nSf.toInt).map(i => db.cString(db.u64(sfArr + i.toLong * sfSz + 8)))

    val (_, fnSecPtr) = db.sections(7)
    val fnArr = db.u64(fnSecPtr); val nFn = db.u32(fnSecPtr + 8); val fnSz = db.u16(fnSecPtr + 12)
    case class Fn(name: String, srcLine: Int, sfIdx: Int)
    val functions: IndexedSeq[Fn] = (0 until nFn.toInt).map { i =>
      val p = fnArr + i.toLong * fnSz
      val namePtr = db.u64(p); val filePtr = db.u64(p + 24)
      Fn(if (namePtr != 0) db.cString(namePtr) else "<unkown function>",
        db.u32(p + 32).toInt, if (filePtr != 0) sfIndex(filePtr) else -1)
    }

    val nodeOf = mutable.Map[Long, Long]()
    val ctx = mutable.Map[Long, CtxInfo]()

    def readChildren(ptr: Long, size: Long, parentCtx: Long, level: Int): Unit = {
      if (size <= 0 || ptr <= 0) return
      var p = ptr
      val end = ptr + size
      while (p < end) {
        val childrenSize = db.u64(p); val childrenPtr = db.u64(p + 8)
        val ctxId = db.u32(p + 16)
        val flags = db.u8(p + 20)
        val lexicalType = db.u8(p + 22)
        val nFlex = db.u8(p + 23)
        val flexBase = p + 32
        var fp = flexBase
        var fnIdx = -1; var sfIdx = -1; var sfLine = -1
        if ((flags & 1) != 0) { fnIdx = ((db.u64(fp) - fnArr) / fnSz).toInt; fp += 8 }
        if ((flags & 2) != 0) { sfIdx = sfIndex(db.u64(fp)); sfLine = db.u16(fp + 8); fp += 16 }
        p = flexBase + 8L * nFlex

        if (lexicalType == 2 || lexicalType == 3) {
          // line / instruction context: no node, collapse to parent
          nodeOf(ctxId) = parentCtx
          readChildren(childrenPtr, childrenSize, parentCtx, level)
        } else {
          nodeOf(ctxId) = ctxId
          val (name, loop) =
            if (lexicalType == 1) ("loop", true)
            else if (fnIdx >= 0) (functions(fnIdx).name, false)
            else ("<unkown function>", false)
          val (file, line) =
            if (lexicalType == 0 && fnIdx >= 0) {
              val f = functions(fnIdx)
              (if (f.sfIdx >= 0) sourceFiles(f.sfIdx) else "", f.srcLine)
            } else (if (sfIdx >= 0) sourceFiles(sfIdx) else "", sfLine)
          ctx(ctxId) = CtxInfo(name, file, line, loop, parentCtx, level)
          readChildren(childrenPtr, childrenSize, ctxId, level + 1)
        }
      }
    }

    val (_, ctSecPtr) = db.sections(3)
    val epArr = db.u64(ctSecPtr); val nEp = db.u16(ctSecPtr + 8); val epSz = db.u8(ctSecPtr + 10)
    for (i <- 0 until nEp) {
      val p = epArr + i.toLong * epSz
      val childrenSize = db.u64(p); val childrenPtr = db.u64(p + 8)
      val ctxId = db.u32(p + 16)
      val prettyPtr = db.u64(p + 24)
      nodeOf(ctxId) = ctxId
      ctx(ctxId) = CtxInfo(db.cString(prettyPtr), "", -1, loopType = false,
        parent = -1L, level = 0)
      readChildren(childrenPtr, childrenSize, ctxId, 1)
    }
    Meta(nodeOf.toMap, ctx.toMap)
  }

  // identifier names needed to decode hierarchical identifier tuples
  private def parseIdentifierNames(db: Db): IndexedSeq[String] = {
    val (_, idSecPtr) = db.sections(1)
    val arrPtr = db.u64(idSecPtr); val n = db.u8(idSecPtr + 8)
    (0 until n).map(i => db.cString(db.u64(arrPtr + i * 8L)))
  }

  // ---- profile.db -----------------------------------------------------

  case class Hit(rank: Option[Long], thread: Option[Long], node: Option[Long],
                 core: Option[Long]) extends Serializable

  private def parseProfiles(path: String, idNames: IndexedSeq[String]): IndexedSeq[Hit] = {
    val db = new Db(path, "prof", 2)
    val (_, piPtr) = db.sections(0)
    val (hitSize, hitSecPtr) = db.sections(1)

    // hierarchical identifier tuples, keyed by their file offset
    val hitMap = mutable.Map[Long, Hit]()
    var p = hitSecPtr
    while (p - hitSecPtr < hitSize) {
      val start = p
      val n = db.u16(p); p += 8
      val m = mutable.Map[String, Long]()
      for (_ <- 0 until n) {
        val kind = db.u8(p)
        val physical = db.u64(p + 8)
        if (kind < idNames.length) m(idNames(kind)) = physical
        p += 16
      }
      hitMap(start) = Hit(m.get("RANK"), m.get("THREAD"), m.get("NODE"), m.get("CORE"))
    }

    val profArr = db.u64(piPtr); val nProf = db.u32(piPtr + 8); val profSz = db.u8(piPtr + 12)
    val hitPtrs = (0 until nProf.toInt).map(i => db.u64(profArr + i.toLong * profSz + 0x20))
    // the summary profile has a zero id-tuple pointer -> empty identity
    hitPtrs.map(hp => if (hp != 0L) hitMap(hp) else Hit(None, None, None, None))
  }

  // ---- trace.db -------------------------------------------------------

  case class TraceLine(profileIndex: Int, start: Long, end: Long) extends Serializable

  /** Bounded positional read — trace.db can be huge (it holds every
    * sample); the driver must only touch the header + trace-header
    * section, never the whole file. */
  private def readRange(path: String, pos: Long, len: Int): ByteBuffer = {
    val ch = java.nio.channels.FileChannel.open(Paths.get(path))
    try {
      val bb = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
      var p = pos; var eof = false
      while (bb.hasRemaining && !eof) {
        val r = ch.read(bb, p)
        if (r < 0) eof = true else p += r
      }
      bb.flip(); bb
    } finally ch.close()
  }

  private def parseTraceHeaders(path: String): (Seq[TraceLine], Long, Long) = {
    val head = readRange(path, 0, 32)
    val magic = new Array[Byte](14); head.get(magic)
    require(new String(magic, 0, 10, "ASCII") == "HPCTOOLKIT" &&
      new String(magic, 10, 4, "ASCII") == "trce", s"bad magic in $path")
    val thPtr = head.getLong(24) // (u64 size, u64 ptr) of section 0
    // layout at thPtr: pTraces u64, nTraces u32, szTrace u8, 3B pad,
    //                  min u64, max u64
    val sec = readRange(path, thPtr, 32)
    val arr = sec.getLong(0); val n = sec.getInt(8)
    val sz = sec.get(12) & 0xff
    val minTs = sec.getLong(16); val maxTs = sec.getLong(24)
    val lineBytes = readRange(path, arr, n * sz)
    val lines = (0 until n).map { i =>
      val p = i * sz
      TraceLine(lineBytes.getInt(p), lineBytes.getLong(p + 8),
        lineBytes.getLong(p + 16))
    }
    (lines, minTs, maxTs)
  }

  // ---- reconstruction -------------------------------------------------

  private val outSchema = StructType(Seq(
    StructField("line_idx", IntegerType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField(TimestampNs, LongType, nullable = false),
    StructField(EventType, StringType, nullable = false),
    StructField(Name, StringType, nullable = false),
    StructField(Process, IntegerType, nullable = true),
    StructField(Thread, IntegerType, nullable = true),
    StructField("host", LongType, nullable = true),
    StructField("core", LongType, nullable = true),
    StructField("source_file", StringType, nullable = true),
    StructField("source_line", IntegerType, nullable = true),
    StructField("calling_context_id", LongType, nullable = false)
  ))

  /** Walk one trace line's samples, emitting Enter/Leave rows
    * (hpctoolkit_reader.py:1208-1337). */
  private def reconstructLine(meta: Meta, hit: Hit, lineIdx: Int,
                              samples: Iterator[(Long, Long)],
                              maxRelTs: Long): Iterator[Row] = {
    val out = mutable.ArrayBuffer[Row]()
    var seq = 0L
    def emit(ts: Long, nodeCtx: Long, isEnter: Boolean): Unit = {
      val info = meta.ctx(nodeCtx)
      val et =
        if (info.loopType) { if (isEnter) "Loop Enter" else "Loop Leave" }
        else { if (isEnter) Enter else Leave }
      out += Row(lineIdx, seq, ts, et, info.name,
        hit.rank.map(_.toInt).map(Int.box).orNull,
        hit.thread.map(_.toInt).map(Int.box).orNull,
        hit.node.map(Long.box).orNull, hit.core.map(Long.box).orNull,
        info.file, Int.box(info.line), nodeCtx)
      seq += 1
    }
    def level(c: Long): Int = meta.ctx(c).level
    def lca(a: Long, b: Long): Long = {
      if (a < 0 || b < 0) return -1L
      var n1 = a; var n2 = b
      while (level(n1) > level(n2)) n1 = meta.ctx(n1).parent
      while (level(n2) > level(n1)) n2 = meta.ctx(n2).parent
      while (n1 != n2 && n1 >= 0 && n2 >= 0) { n1 = meta.ctx(n1).parent; n2 = meta.ctx(n2).parent }
      if (n1 == n2) n1 else -1L
    }

    var lastId = -1L
    var lastNode = -1L
    for ((ts, ctxId) <- samples) {
      if (ctxId != lastId) {
        val currentNode =
          if (ctxId == 0) -1L else meta.nodeOf.getOrElse(ctxId, -1L)
        val common = if (lastNode >= 0) lca(currentNode, lastNode) else -1L
        // close frames up to the LCA
        var n = lastNode
        while (n >= 0 && n != common) { emit(ts, n, isEnter = false); n = meta.ctx(n).parent }
        // open frames from below the LCA down to the current node
        if (currentNode >= 0) {
          val minLevel = if (common >= 0) level(common) else -1
          val chain = mutable.ArrayBuffer[Long]()
          var m = currentNode
          while (m >= 0 && level(m) > minLevel) { chain += m; m = meta.ctx(m).parent }
          chain.reverseIterator.foreach(c => emit(ts, c, isEnter = true))
        }
        lastNode = currentNode
        lastId = ctxId
      }
    }
    // close all still-open frames at trace end (py:1307-1337)
    var n = lastNode
    while (n >= 0) { emit(maxRelTs, n, isEnter = false); n = meta.ctx(n).parent }
    out.iterator
  }

  /** Read an HPCToolkit database directory into canonical events. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val metaDb = new Db(s"$dir/meta.db", "meta", 8) // one load, two parsers
    val meta = parseMeta(metaDb)
    val idNames = parseIdentifierNames(metaDb)
    val hits = parseProfiles(s"$dir/profile.db", idNames)
    val (lines, minTs, maxTs) = parseTraceHeaders(s"$dir/trace.db")

    val metaBc = spark.sparkContext.broadcast(meta)
    val hitsBc = spark.sparkContext.broadcast(hits)
    val tracePath = s"$dir/trace.db"
    val maxRel = maxTs - minTs

    // one task per trace line; each task reads only its byte range
    val rows = spark.sparkContext
      .parallelize(lines.zipWithIndex.toIndexedSeq, math.max(lines.size, 1))
      .flatMap { case (line, idx) =>
        val ch = java.nio.channels.FileChannel.open(Paths.get(tracePath))
        try {
          val len = (line.end - line.start).toInt
          val bb = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
          // FileChannel.read may return short — loop until full/EOF, or
          // the tail of this line's samples would silently vanish
          var pos = line.start; var eof = false
          while (bb.hasRemaining && !eof) {
            val r = ch.read(bb, pos)
            if (r < 0) eof = true else pos += r
          }
          bb.flip()
          val samples = Iterator.continually {
            if (bb.remaining() >= 12) Some((bb.getLong() - minTs, bb.getInt() & 0xffffffffL))
            else None
          }.takeWhile(_.isDefined).map(_.get)
          reconstructLine(metaBc.value, hitsBc.value(line.profileIndex), idx,
            samples, maxRel).toVector
        } finally ch.close()
      }

    val df = spark.createDataFrame(rows, outSchema)
    Ingest.assignDenseIds(df, EventId, col(TimestampNs), col("line_idx"), col("seq"))
      .select(col(EventId), col(TimestampNs), col(EventType), col(Name),
        col(Process), col(Thread), col("host"), col("core"),
        col("source_file"), col("source_line"), col("calling_context_id"))
  }
}
