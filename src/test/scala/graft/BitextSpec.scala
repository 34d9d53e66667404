package graft

import org.apache.spark.sql.functions._
import graft.analysis.CommOps
import graft.model.Schemas._
import graft.scale.Bitext

/** Margin-based cross-lingual mining + comm wait classification. */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, Seq[Float], String)*) = {
    val emb = rows.map { case (id, v, _) => (id, v) }
      .toDF("vec_id", "embedding")
    val docs = rows.map { case (id, _, lang) => (id, lang) }
      .toDF("doc_id", "lang")
    (emb, docs)
  }

  /** Driver-side reference of the integer-exact margin pipeline:
    * micro-quantized integer dot/norms, one IEEE cosine expression,
    * true unshifted ratio margin with sign-explicit division — the
    * Bitext.scala contract, re-derived independently. */
  private def refMarginsClean(a: Seq[(Long, Seq[Float])],
                              b: Seq[(Long, Seq[Float])],
                              k: Int): Map[(Long, Long), Long] = {
    def q(x: Seq[Float]): Seq[Long] =
      x.map(v => math.floor(v.toDouble * 1000000d).toLong)
    def sOf(x: Seq[Float], y: Seq[Float]): Long = {
      val (qx, qy) = (q(x), q(y))
      val dot = qx.zip(qy).map { case (u, v) => u * v }.sum
      val n2x = qx.map(u => u * u).sum
      val n2y = qy.map(u => u * u).sum
      if (n2x == 0L || n2y == 0L) 0L
      else math.floor(
        dot.toDouble * 1000000d / math.sqrt(n2x.toDouble * n2y.toDouble)).toLong
    }
    val s = (for ((ai, av) <- a; (bi, bv) <- b)
      yield (ai, bi) -> sOf(av, bv)).toMap
    val sumSrc = a.map { case (ai, _) =>
      ai -> b.map { case (bi, _) => (s((ai, bi)), bi) }
        .sortBy { case (v, id) => (-v, id) }.take(k).map(_._1).sum
    }.toMap
    val sumDst = b.map { case (bi, _) =>
      bi -> a.map { case (ai, _) => (s((ai, bi)), ai) }
        .sortBy { case (v, id) => (-v, id) }.take(k).map(_._1).sum
    }.toMap
    val cntSrc = math.min(k, b.size).toLong
    val cntDst = math.min(k, a.size).toLong
    s.map { case ((ai, bi), sim) =>
      val num = sim * (cntSrc + cntDst) * 1000000L
      val den = sumSrc(ai) + sumDst(bi)
      val m =
        if (den == 0L) { if (num > 0L) 9000000000000000L
          else if (num < 0L) -9000000000000000L else 0L }
        else if ((num >= 0L) == (den > 0L)) math.abs(num) / math.abs(den)
        else -(math.abs(num) / math.abs(den))
      (ai, bi) -> m
    }
  }

  test("margin pipeline matches the driver-side integer reference exactly") {
    val a = Seq(1L -> Seq(1f, 0f, 0f, 0.2f), 2L -> Seq(0f, 1f, 0.3f, 0f),
      3L -> Seq(0.5f, 0.5f, 0f, 0.1f))
    val b = Seq(10L -> Seq(0.9f, 0.1f, 0f, 0.2f), 11L -> Seq(0f, 0.8f, 0.4f, 0f),
      12L -> Seq(0.4f, 0.4f, 0.2f, 0f), 13L -> Seq(-0.3f, 0.2f, 0.9f, 0f))
    val (emb, docs) = corpus(
      (a ++ b).map { case (id, v) =>
        (id, v, if (id < 10) "en" else "de")
      }: _*)
    val k = 2
    val ref = refMarginsClean(a, b, k)
    val bestRef = a.map { case (ai, _) =>
      val cands = b.map { case (bi, _) => (ref((ai, bi)), bi) }
      val (m, bi) = cands.sortBy { case (v, id) => (-v, id) }.head
      (ai, bi, m)
    }.filter(_._3 > 0L) // threshold 0: keep every best pair
    val got = Bitext.marginPairs(emb, docs, "en", "de", k = k,
        thresholdMicro = 0L)
      .select("src_id", "dst_id", "margin_micro")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bestRef.toSet)
  }

  test("hub suppression: the everything-neighbor loses to the specific match") {
    // hub 20 is decently close to all three src docs; specialist 21 is very
    // close to src 1 only. Raw cosine ranks the hub first for src 1, but
    // the margin's neighborhood normalizer must prefer the specialist.
    val a = Seq(1L -> Seq(1f, 0f, 0f), 2L -> Seq(0f, 1f, 0f),
      3L -> Seq(0f, 0f, 1f))
    val hub = Seq(0.64f, 0.6f, 0.6f) // cos with src1 ≈ 0.60 — top-1 by cosine
    val spec = Seq(0.9f, 0.52f, 0f) // cos with src1 ≈ 0.87, junk elsewhere
    val b = Seq(20L -> hub, 21L -> spec, 22L -> Seq(-1f, 0.1f, 0.1f))
    val (emb, docs) = corpus(
      (a ++ b).map { case (id, v) => (id, v, if (id < 10) "en" else "de") }: _*)
    val got = Bitext.marginPairs(emb, docs, "en", "de", k = 2,
        thresholdMicro = 0L)
      .select("src_id", "dst_id").as[(Long, Long)].collect().toMap
    assert(got(1L) == 21L)
  }

  test("mutual pairs are the symmetric subset of forward best matches") {
    val rng = new scala.util.Random(31)
    val rows = (0L until 30L).map { i =>
      (i, Seq.fill(6)(rng.nextFloat() * 2 - 1f),
        if (i % 2 == 0) "en" else "de")
    }
    val (emb, docs) = corpus(rows: _*)
    val fwd = Bitext.marginPairs(emb, docs, "en", "de", k = 3,
        thresholdMicro = 0L)
      .select("src_id", "dst_id").as[(Long, Long)].collect().toSet
    val bwd = Bitext.marginPairs(emb, docs, "de", "en", k = 3,
        thresholdMicro = 0L)
      .select("src_id", "dst_id").as[(Long, Long)].collect()
      .map { case (s, d) => (d, s) }.toSet
    val mutual = Bitext.mutualPairs(emb, docs, "en", "de", k = 3,
        thresholdMicro = 0L)
      .select("src_id", "dst_id").as[(Long, Long)].collect().toSet
    assert(mutual == (fwd intersect bwd))
    assert(mutual.nonEmpty && mutual.subsetOf(fwd))
    // at most one pair per endpoint on either side
    assert(mutual.groupBy(_._2).values.forall(_.size == 1))
  }

  test("k larger than the candidate side still computes (sums over available)") {
    val (emb, docs) = corpus(
      (1L, Seq(1f, 0f), "en"), (10L, Seq(0.9f, 0.1f), "de"),
      (11L, Seq(0f, 1f), "de"))
    val rows = Bitext.marginPairs(emb, docs, "en", "de", k = 4,
      thresholdMicro = 0L).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("dst_id") == 10L)
  }

  test("signedMarginMicro equals the batch SQL CASE over the sign/zero grid") {
    // pins the streaming Scala rule to the exact SQL expression used by
    // scoredPairs — the two must never drift
    val vals = Seq(-9000000L, -7L, -1L, 0L, 1L, 7L, 9000000L)
    val grid = for (num <- vals; den <- vals) yield (num, den)
    val df = grid.toDF("num", "den")
      .withColumn("sql_m", expr(
        """CASE WHEN den = 0 THEN
          |       CASE WHEN num > 0 THEN 9000000000000000
          |            WHEN num < 0 THEN -9000000000000000 ELSE 0 END
          |     WHEN (num >= 0) = (den > 0) THEN abs(num) div abs(den)
          |     ELSE -(abs(num) div abs(den)) END""".stripMargin))
    df.collect().foreach { r =>
      val (num, den) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == Bitext.signedMarginMicro(num, den),
        s"num=$num den=$den")
    }
  }

  test("negative cosines: margin signs follow sign(num)·sign(den) exactly") {
    // src 1 is anti-aligned with every candidate → all pair cosines (and
    // both neighborhood sums) negative; the ref model must agree on every
    // margin value, exercising the ELSE branches of the sign-explicit CASE
    val a = Seq(1L -> Seq(-1f, -0.2f, 0f), 2L -> Seq(0.1f, -0.9f, 0.2f))
    val b = Seq(10L -> Seq(1f, 0.3f, 0f), 11L -> Seq(0.8f, 0.5f, 0.1f),
      12L -> Seq(0.9f, 0.1f, 0.4f))
    val (emb, docs) = corpus(
      (a ++ b).map { case (id, v) => (id, v, if (id < 10) "en" else "de") }: _*)
    val ref = refMarginsClean(a, b, 2)
    val got = Bitext.marginPairs(emb, docs, "en", "de", k = 2,
        thresholdMicro = Long.MinValue)
      .select("src_id", "dst_id", "margin_micro")
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (s, d, m) => assert(ref((s, d)) == m) }
  }

  test("zero-norm vectors score 0, not NaN, and never win") {
    val (emb, docs) = corpus(
      (1L, Seq(0f, 0f), "en"), (2L, Seq(1f, 0f), "en"),
      (10L, Seq(0.9f, 0.1f), "de"), (11L, Seq(0f, 0f), "de"))
    val rows = Bitext.marginPairs(emb, docs, "en", "de", k = 2,
      thresholdMicro = 0L).collect()
    // src 2 must match dst 10; the all-zero vectors produce s = 0 rows
    // that lose to any positive-margin candidate
    val m = rows.map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("dst_id")).toMap
    assert(m.get(2L).contains(10L))
    rows.foreach(r => assert(!r.isNullAt(r.fieldIndex("margin_micro"))))
  }

  test("candidate-fed scoring equals brute force when candidates cover all pairs") {
    val rng = new scala.util.Random(7)
    val rows = (0L until 24L).map { i =>
      (i, Seq.fill(5)(rng.nextFloat() * 2 - 1f), if (i % 2 == 0) "en" else "de")
    }
    val (emb, docs) = corpus(rows: _*)
    val allPairs = rows.filter(_._3 == "en").map(_._1)
      .flatMap(s => rows.filter(_._3 == "de").map(d => (s, d._1)))
      .toDF("src_id", "dst_id")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("src_id", "dst_id", "sim_micro", "margin_micro")
        .as[(Long, Long, Long, Long)].collect().toSet
    val brute = norm(Bitext.marginPairs(emb, docs, "en", "de", k = 3,
      thresholdMicro = 0L))
    val fed = norm(Bitext.marginPairs(emb, docs, "en", "de", k = 3,
      thresholdMicro = 0L, candidates = Some(allPairs)))
    assert(fed == brute)
    val bruteM = norm(Bitext.mutualPairs(emb, docs, "en", "de", k = 3,
      thresholdMicro = 0L))
    val fedM = norm(Bitext.mutualPairs(emb, docs, "en", "de", k = 3,
      thresholdMicro = 0L, candidates = Some(allPairs)))
    assert(fedM == bruteM)
  }

  test("candidate-fed scoring plans keyed joins — no nested-loop cross join") {
    val rng = new scala.util.Random(3)
    val rows = (0L until 20L).map { i =>
      (i, Seq.fill(4)(rng.nextFloat()), if (i % 2 == 0) "en" else "de")
    }
    val (emb, docs) = corpus(rows: _*)
    val cand = rows.filter(_._3 == "en").map(_._1)
      .flatMap(s => rows.filter(_._3 == "de").map(d => (s, d._1)))
      .toDF("src_id", "dst_id")
    val fed = Bitext.marginPairs(emb, docs, "en", "de",
      candidates = Some(cand)).queryExecution.executedPlan.toString
    assert(!fed.contains("BroadcastNestedLoopJoin") &&
      !fed.contains("CartesianProduct"),
      s"candidate path must not plan a cross join:\n${fed.take(800)}")
    // the brute-force default IS the broadcast cross product — the
    // documented one-side-fits baseline; the contract is that ONLY the
    // explicit default takes it
    val brute = Bitext.marginPairs(emb, docs, "en", "de")
      .queryExecution.executedPlan.toString
    assert(brute.contains("BroadcastNestedLoopJoin"))
  }

  test("clusterCandidates recovers planted translation pairs without the cross join") {
    // two well-separated semantic clusters; each en doc's true de twin
    // sits in the same cluster — cluster-probe candidates must contain
    // every true pair, and the candidate-fed margin run must find them
    val clusterA = Seq(1f, 0f, 0f, 0f)
    val clusterB = Seq(0f, 0f, 1f, 0f)
    def jitter(base: Seq[Float], eps: Float) =
      base.map(v => v + eps)
    val en = Seq(0L -> jitter(clusterA, 0.01f), 2L -> jitter(clusterA, 0.03f),
      4L -> jitter(clusterB, 0.01f), 6L -> jitter(clusterB, 0.03f))
    val de = Seq(1L -> jitter(clusterA, 0.02f), 3L -> jitter(clusterA, 0.04f),
      5L -> jitter(clusterB, 0.02f), 7L -> jitter(clusterB, 0.04f))
    val (emb, docs) = corpus(
      (en.map { case (i, v) => (i, v, "en") } ++
        de.map { case (i, v) => (i, v, "de") }): _*)
    val cand = Bitext.clusterCandidates(emb, docs, "en", "de",
      nClusters = 2, nProbe = 1)
    val pairs = cand.as[(Long, Long)].collect().toSet
    // same-cluster pairs present, cross-cluster pairs absent (nProbe=1)
    assert(pairs.contains((0L, 1L)) && pairs.contains((4L, 5L)))
    assert(pairs.size < en.size * de.size)
    val mined = Bitext.mutualPairs(emb, docs, "en", "de", k = 2,
        thresholdMicro = 0L, candidates = Some(cand))
      .select("src_id", "dst_id").as[(Long, Long)].collect().toSet
    assert(mined.nonEmpty)
    // every mined pair is same-cluster: src and dst ids from one plant
    mined.foreach { case (s, d) =>
      assert((s <= 2L && d <= 3L) || (s >= 4L && d >= 5L)) }
  }

  test("adaptive default: over-budget dst side auto-routes to cluster " +
      "candidates, equal to the explicit generator; MaxValue pins brute force") {
    val clusterA = Seq(1f, 0f, 0f, 0f)
    val clusterB = Seq(0f, 0f, 1f, 0f)
    def jitter(base: Seq[Float], eps: Float) = base.map(v => v + eps)
    val en = Seq(0L -> jitter(clusterA, 0.01f), 2L -> jitter(clusterA, 0.03f),
      4L -> jitter(clusterB, 0.01f), 6L -> jitter(clusterB, 0.03f))
    val de = Seq(1L -> jitter(clusterA, 0.02f), 3L -> jitter(clusterA, 0.04f),
      5L -> jitter(clusterB, 0.02f), 7L -> jitter(clusterB, 0.04f))
    val (emb, docs) = corpus(
      (en.map { case (i, v) => (i, v, "en") } ++
        de.map { case (i, v) => (i, v, "de") }): _*)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("src_id", "dst_id", "sim_micro", "margin_micro")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    // under budget: exact broadcast brute force
    val under = Bitext.marginPairs(emb, docs, "en", "de", k = 2,
      thresholdMicro = 0L)
    assert(under.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    // over budget (4 dst docs > 2): auto-routed through clusterCandidates
    val auto = Bitext.marginPairs(emb, docs, "en", "de", k = 2,
      thresholdMicro = 0L, maxBroadcastRows = 2L)
    assert(!auto.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    // parity: auto-routing == explicitly passing the default generator
    val explicitCand = Bitext.marginPairs(emb, docs, "en", "de", k = 2,
      thresholdMicro = 0L,
      candidates = Some(Bitext.clusterCandidates(emb, docs, "en", "de")))
    assert(norm(auto) == norm(explicitCand))
    // the planted true twins survive the routed path
    val mined = auto.select("src_id", "dst_id").as[(Long, Long)]
      .collect().toSet
    assert(mined.contains((0L, 1L)) && mined.contains((4L, 5L)))
    // Long.MaxValue pins brute force regardless of size budget
    val pinned = Bitext.marginPairs(emb, docs, "en", "de", k = 2,
      thresholdMicro = 0L, maxBroadcastRows = Long.MaxValue)
    assert(pinned.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(norm(pinned) == norm(under))
  }

  test("streaming bitextMine over the frozen index reproduces batch marginPairs exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingOps
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(13)
    val rows = (0L until 30L).map { i =>
      (i, Seq.fill(6)(rng.nextFloat() * 2 - 1f), if (i % 2 == 0) "en" else "de")
    }
    val (emb, docs) = corpus(rows: _*)
    val k = 3
    val batch = Bitext.marginPairs(emb, docs, "en", "de", k = k,
        thresholdMicro = 0L)
      .select("src_id", "dst_id", "sim_micro", "margin_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    val index = Bitext.buildIndex(emb, docs, "en", "de", k = k)
    assert(index.length == 15 && index.sliding(2).forall(p =>
      p.length < 2 || p(0).dstId < p(1).dstId))

    val stream = MemoryStream[(Long, Seq[Float])]
    val mined = StreamingOps.bitextMine(
      stream.toDF().toDF("doc_id", "embedding"), index.toSeq, k = k,
      thresholdMicro = 0L)
    val q = mined.writeStream.format("memory").queryName("bitext_mine")
      .outputMode("append").start()
    try {
      // replay the reference src side across TWO micro-batches: statless
      // per-row scoring must not care about batch boundaries
      val srcRows = rows.filter(_._3 == "en").map(r => (r._1, r._2))
      stream.addData(srcRows.take(7))
      q.processAllAvailable()
      stream.addData(srcRows.drop(7))
      q.processAllAvailable()
      val got = spark.table("bitext_mine")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("day-2 batch mining against the persisted index TABLE matches the " +
      "streaming miner's batch-parity contract exactly") {
    val rng = new scala.util.Random(13)
    val rows = (0L until 30L).map { i =>
      (i, Seq.fill(6)(rng.nextFloat() * 2 - 1f), if (i % 2 == 0) "en" else "de")
    }
    val (emb, docs) = corpus(rows: _*)
    val k = 3
    val batch = Bitext.marginPairs(emb, docs, "en", "de", k = k,
        thresholdMicro = 0L)
      .select("src_id", "dst_id", "sim_micro", "margin_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    // the DataFrame index carries the same frozen stats as the collected
    // IndexEntry array, and survives a parquet round-trip
    val tmp = java.nio.file.Files.createTempDirectory("btidx").toString
    Bitext.indexTable(emb, docs, "en", "de", k = k)
      .write.mode("overwrite").parquet(tmp)
    val idxDf = spark.read.parquet(tmp)
    val entries = Bitext.buildIndex(emb, docs, "en", "de", k = k)
    val dfStats = idxDf.select("dst_id", "nb2", "sum_dst", "cnt_dst")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(dfStats ==
      entries.map(e => (e.dstId, e.nb2, e.sumDst, e.cntDst)).toSet)
    // replaying the reference src corpus through the day-2 join
    // reproduces batch marginPairs exactly (the streaming miner's
    // contract, relationally)
    val srcEmb = emb.join(docs.filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id")), "vec_id")
    val got = Bitext.mineAgainstIndex(srcEmb, idxDf, k = k,
        thresholdMicro = 0L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == batch)
    // a genuinely new day-2 batch: per-src scoring is independent, so a
    // subset of src docs yields exactly the full run's rows for them
    val half = srcEmb.filter(col("vec_id") % 4 === 0)
    val gotHalf = Bitext.mineAgainstIndex(half, idxDf, k = k,
        thresholdMicro = 0L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(gotHalf == batch.filter(_._1 % 4 == 0) && gotHalf.nonEmpty)
  }

  test("protocol switch finds a planted eager->rendezvous size threshold") {
    // channel 0->1: sizes 10..50 step 10; latency 2ms below 40 bytes,
    // 50ms at 40+ — the CUSUM argmax must land on the last eager size
    val sizes = Seq(10L, 20L, 30L, 40L, 50L)
    val rows = sizes.zipWithIndex.flatMap { case (sz, i) =>
      val lat = if (sz >= 40L) 50000000L else 2000000L // ns
      val sendTs = 1000000000L * (i + 1)
      Seq(
        (i * 2L, sendTs, "MpiSend", 0, 1, sz),
        (i * 2L + 1L, sendTs + lat, "MpiRecv", 1, 0, sz))
    }
    val ev = rows.toDF("eid", "ts", "nm", "proc", "peer", "len")
      .select(col("eid").as(EventId), col("ts").as(TimestampNs),
        col("nm").as(Name), col("proc").as(Process),
        col("peer").as(AttrReceiver), col("len").as(AttrMsgLength),
        lit("Instant").as(EventType))
    val out = CommOps.protocolSwitch(ev).collect()
    val c01 = out.find(r => r.getInt(0) == 0 && r.getInt(1) == 1).get
    // argmax of |m*C_r - r*T| sits at the LAST pre-shift message (30)
    assert(c01.getAs[Long]("threshold_bytes") == 30L)
    assert(c01.getAs[Long]("n_msgs") == 5L)
  }

  test("wait classes partition the matched pairs and sum their times") {
    // channel 0->1: send@10/recv@25 (late receiver, transit 15),
    //               send@40/recv@30 (late sender, wait 10)
    // channel 1->0: send@5/recv@5 (ties count as late receiver, transit 0)
    val ev = Seq(
      (0L, 10L, "MpiSend", 0, 1), (1L, 40L, "MpiSend", 0, 1),
      (2L, 25L, "MpiRecv", 1, 0), (3L, 30L, "MpiRecv", 1, 0),
      (4L, 5L, "MpiSend", 1, 0), (5L, 5L, "MpiRecv", 0, 1)
    ).toDF("eid", "ts", "nm", "proc", "peer")
      .select(col("eid").as(EventId), col("ts").as(TimestampNs),
        col("nm").as(Name), col("proc").as(Process),
        col("peer").as(AttrReceiver), lit("Instant").as(EventType))
    val out = CommOps.waitClasses(ev).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
    val c01 = out((0, 1))
    assert(c01.getAs[Long]("n_matched") == 2L)
    assert(c01.getAs[Long]("n_late_sender") == 1L)
    assert(c01.getAs[Long]("late_sender_wait_ns") == 10L)
    assert(c01.getAs[Long]("n_late_receiver") == 1L)
    assert(c01.getAs[Long]("late_receiver_transit_ns") == 15L)
    val c10 = out((1, 0))
    assert(c10.getAs[Long]("n_late_receiver") == 1L &&
      c10.getAs[Long]("late_receiver_transit_ns") == 0L)
  }
}
