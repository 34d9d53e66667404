package graft.demo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas._

/** Deterministic synthetic traces derived from the driver testdata
  * (TESTDATA.md) — used by SparkEntry's correctness queries.
  *
  * The derivations are chosen so the *right answers* are relationally known
  * (DuckDB can compute them straight from orders/lineitem/events), while
  * the Spark side runs the real trace operators on the derived event
  * stream. If the operators are correct, the two agree.
  *
  * Call trace (well-nested, 3 levels, all timestamps unique,
  * event_id := timestamp):
  *   per order   o:  Enter/Leave  "order_<o_orderpriority>"
  *                   [ok·1e6, ok·1e6 + 999_000]
  *   per item  l∈o:  Enter/Leave  "item_<l_returnflag>"
  *                   [ok·1e6 + rn·50_000, ok·1e6 + rn·50_000 + qty·1000 − 10]
  *   per item ship:  Enter/Leave  "ship_<l_linestatus>"
  *                   [ok·1e6 + rn·50_000 + 100, ok·1e6 + rn·50_000 + qty·500]
  *   process = o_custkey % 64.
  *   rn = row_number per order over (l_linenumber, l_partkey, l_suppkey,
  *   l_quantity, l_extendedprice) — l_linenumber alone is NOT unique in
  *   this synthetic data (and would collide timestamps); rn ≤ 17 keeps
  *   items inside the order's 1e6-ns slot, qty ∈ [1,50] keeps each item in
  *   its 50k slot (leave at qty·1000−10 dodges the next slot boundary) and
  *   its ship strictly inside the item.
  *
  * Comm trace (Instant events with promoted comm attributes):
  *   process    = user_id % 16
  *   name       = click→MpiSend, view→MpiIsend, purchase→MpiRecv,
  *                error→MpiIrecv, else Other
  *   timestamp  = unix_micros(ts)·1000
  *   receiver   = (json props.k) % 16,  msg_length = floor(value·100)
  */
object TraceGen {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** lineitem ranked within its order by the 5-column total order (a
    * verified zero-tie key), joined to orders — the ONE derivation both
    * [[callTrace]] and [[itemIntervals]] (and their SQL CTE mirrors)
    * build on; keep it single-sourced so they can never drift. */
  private def rankedItems(spark: SparkSession, sfDir: String,
                          orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val itemRank = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"))
    table(spark, sfDir, "lineitem")
      .withColumn("rn", row_number().over(itemRank).cast(LongType))
      .join(orders, col("l_orderkey") === col("ok"))
  }

  def callTrace(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
        col("o_orderpriority").as("prio"))
    val items = rankedItems(spark, sfDir, orders)
      .select(col("ok"), col("ck"), col("rn"),
        col("l_quantity").cast(LongType).as("qty"),
        col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))

    val proc = (col("ck") % 64).cast(IntegerType)
    // one struct-explode per source table (not a 6-branch union, which would
    // re-run the scan/window/join once per branch)
    def pair(ts: org.apache.spark.sql.Column, et: String,
             nm: org.apache.spark.sql.Column) =
      struct(ts.cast(LongType).as("ts"), lit(et).as("et"), nm.as("nm"))

    val oEvents = orders.select(proc.as(Process),
      explode(array(
        pair(col("ok") * 1000000L, Enter, concat(lit("order_"), col("prio"))),
        pair(col("ok") * 1000000L + 999000L, Leave, concat(lit("order_"), col("prio")))
      )).as("e"))
    val iBase = col("ok") * 1000000L + col("rn") * 50000L
    val iEvents = items.select(proc.as(Process),
      explode(array(
        pair(iBase, Enter, concat(lit("item_"), col("rf"))),
        pair(iBase + col("qty") * 1000L - 10L, Leave, concat(lit("item_"), col("rf"))),
        pair(iBase + 100L, Enter, concat(lit("ship_"), col("ls"))),
        pair(iBase + col("qty") * 500L, Leave, concat(lit("ship_"), col("ls")))
      )).as("e"))

    oEvents.unionByName(iEvents).select(
      col("e.ts").as(EventId), col("e.ts").as(TimestampNs),
      col("e.et").as(EventType), col("e.nm").as(Name), col(Process))
  }

  /** Item spans as Nsight-style interval rows (name, start_ns, end_ns,
    * pid, tid) — same derivation as the call trace's item level, with a
    * scrambled pid (process·10+3) so the reader's dense-rank renumbering is
    * actually exercised. */
  def itemIntervals(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
    rankedItems(spark, sfDir, orders)
      .select(
        concat(lit("item_"), col("l_returnflag")).as("name"),
        (col("ok") * 1000000L + col("rn") * 50000L).as("start_ns"),
        (col("ok") * 1000000L + col("rn") * 50000L +
          col("l_quantity").cast(LongType) * 1000L - 10L).as("end_ns"),
        ((col("ck") % 64) * 10 + 3).as("pid"),
        lit(0L).as("tid"))
  }

  /** Item and ship spans as CLASSED interval rows (process, cls,
    * start, end) — the two-stream shape for overlap analysis; same
    * derivation as [[callTrace]]'s item level (ship strictly inside its
    * item, so the relational overlap truth is the ship span itself). */
  def callIntervals(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
    val iBase = col("ok") * 1000000L + col("rn") * 50000L
    rankedItems(spark, sfDir, orders)
      .select((col("ck") % 64).cast(IntegerType).as("process"),
        explode(array(
          struct(lit("item").as("cls"), iBase.as("start"),
            (iBase + col("l_quantity").cast(LongType) * 1000L - 10L).as("end")),
          struct(lit("ship").as("cls"), (iBase + 100L).as("start"),
            (iBase + col("l_quantity").cast(LongType) * 500L).as("end"))))
          .as("s"))
      .select(col("process"), col("s.cls").as("cls"),
        col("s.start").as("start"), col("s.end").as("end"))
  }

  /** events table with `ts` normalized to a NANOSECOND epoch Long (the
    * canonical trace timestamp), whatever the generator wrote:
    *
    *  - ns-precision parquet timestamp: Spark reads it as a raw ns Long
    *    under the nanosAsLong legacy conf. Values carry sub-µs residue
    *    while DuckDB reads the column µs-truncated — oracle-compared
    *    derivations must µs-truncate themselves (`epoch_us(ts)·1000` on
    *    the SQL side, `ts div 1000 · 1000` on this side, a no-op for the
    *    µs layout below).
    *  - µs-precision naive timestamp (`isAdjustedToUTC=false`): Spark
    *    reads TIMESTAMP_NTZ; convert naive→epoch under UTC so the value
    *    equals DuckDB's `epoch_us(ts)` exactly (no zone shift), ×1000.
    *
    * SIDE EFFECT (deliberate, session-wide): pins the session's
    * `nanosAsLong` legacy conf and — on the NTZ layout — the session
    * time zone to UTC, because the NTZ→epoch cast binds the zone at
    * analysis time. Every harness main already runs pinned to UTC
    * (build.sbt / Verify), so this only matters if the library is
    * embedded in a non-UTC session: convert your own timestamps first
    * in that case.
    */
  def eventsTable(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ =>
        // NTZ→LTZ cast resolves through the session zone; pin it to UTC
        // so unix_micros returns the naive value's epoch µs verbatim
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw.withColumn("ts",
          (unix_micros(col("ts").cast(TimestampType)) * 1000L).as("ts"))
    }
  }

  def commTrace(spark: SparkSession, sfDir: String): DataFrame = {
    eventsTable(spark, sfDir).select(
      col("event_id").as(EventId),
      // µs-truncate: the oracle reads ts through DuckDB's µs TIMESTAMP
      // (epoch_us·1000), so the raw sub-µs residue must not leak in
      expr("ts div 1000 * 1000").cast(LongType).as(TimestampNs),
      lit(Instant).as(EventType),
      when(col("event_type") === "click", "MpiSend")
        .when(col("event_type") === "view", "MpiIsend")
        .when(col("event_type") === "purchase", "MpiRecv")
        .when(col("event_type") === "error", "MpiIrecv")
        .otherwise("Other").as(Name),
      (col("user_id") % 16).cast(IntegerType).as(Process),
      (get_json_object(col("props"), "$.k").cast(IntegerType) % 16).as(AttrReceiver),
      floor(col("value") * 100).cast(LongType).as(AttrMsgLength))
  }

  /** SQL fragments (DuckDB) mirroring the derivations above — prepended to
    * oracle queries via WITH clauses. */
  val callTraceSqlCte: String =
    """WITH ord AS (
      |  SELECT o_orderkey AS ok, CAST(o_custkey % 64 AS INT) AS process,
      |         'order_' || o_orderpriority AS name,
      |         o_orderkey * 1000000 AS t0, o_orderkey * 1000000 + 999000 AS t1
      |  FROM orders),
      |item AS (
      |  SELECT o.o_orderkey AS ok, CAST(o.o_custkey % 64 AS INT) AS process,
      |         o.o_orderpriority AS prio, CAST(l.l_quantity AS BIGINT) AS qty,
      |         'item_' || l.l_returnflag AS name,
      |         'ship_' || l.l_linestatus AS ship_name,
      |         o.o_orderkey * 1000000 + l.rn * 50000 AS t0,
      |         o.o_orderkey * 1000000 + l.rn * 50000 + CAST(l.l_quantity AS BIGINT) * 1000 - 10 AS t1,
      |         o.o_orderkey * 1000000 + l.rn * 50000 + 100 AS s0,
      |         o.o_orderkey * 1000000 + l.rn * 50000 + CAST(l.l_quantity AS BIGINT) * 500 AS s1
      |  FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |          ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice)
      |          AS BIGINT) AS rn FROM lineitem) l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |""".stripMargin

  val commTraceSqlCte: String =
    """WITH comm AS (
      |  SELECT event_id, epoch_us(ts) * 1000 AS timestamp_ns,
      |         CASE event_type WHEN 'click' THEN 'MpiSend' WHEN 'view' THEN 'MpiIsend'
      |              WHEN 'purchase' THEN 'MpiRecv' WHEN 'error' THEN 'MpiIrecv'
      |              ELSE 'Other' END AS name,
      |         CAST(user_id % 16 AS INT) AS process,
      |         CAST(json_extract_string(props, '$.k') AS INT) % 16 AS attr_receiver,
      |         CAST(FLOOR(value * 100) AS BIGINT) AS attr_msg_length
      |  FROM events)
      |""".stripMargin
}
