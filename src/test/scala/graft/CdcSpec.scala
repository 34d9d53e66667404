package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Cdc
import graft.scale.TextOps

/** Content-defined chunking: boundary determinism, the insertion-stability
  * property that motivates CDC, and the rolling-hash/direct-sum identity. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(s: String, w: Int = 8, maskBits: Int = 6): Seq[(Int, Int)] = {
    val a = Cdc.chunkBounds(UTF8String.fromString(s), w, maskBits)
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2); (r.getInt(0), r.getInt(1))
    }
  }

  test("chunks tile the text exactly; empty text yields none") {
    val s = "the quick brown fox jumps over the lazy dog " * 20
    val cs = chunks(s)
    assert(cs.nonEmpty && cs.head._1 == 1)
    assert(cs.map(_._2).sum == s.length)
    cs.sliding(2).foreach { case Seq((s1, l1), (s2, _)) => assert(s2 == s1 + l1)
                            case _ => () }
    assert(chunks("").isEmpty)
    assert(chunks("ab") == Seq((1, 2))) // shorter than the window: one chunk
  }

  test("rolling hash equals the direct window sum at every boundary") {
    val s = "abcdefghijabcdefghij" * 30
    val w = 8
    val ends = chunks(s, w).dropRight(1).map { case (st, ln) => st + ln - 1 }
    // recompute H at each reported boundary by direct summation
    for (pos <- ends) {
      val h = (0 until w).map(j => Cdc.gear(s.charAt(pos - 1 - j)) << j).sum
      assert((h & 63L) == 0L, s"pos $pos not a true boundary")
    }
  }

  test("an insertion far from a boundary leaves later chunks' hashes intact") {
    val base = "the quick brown fox jumps over the lazy dog " * 40
    val edited = base.substring(0, 10) + "XYZQ" + base.substring(10)
    def hashes(s: String) = chunks(s).map { case (st, ln) => s.substring(st - 1, st - 1 + ln) }
    val (hb, he) = (hashes(base), hashes(edited))
    // chunks realign after the edit: the sequences share a long common
    // suffix (only the chunk(s) containing the insertion may differ)
    val suffix = hb.reverse.zip(he.reverse).takeWhile { case (a, b) => a == b }.size
    assert(suffix >= hb.size - 3,
      s"only a $suffix-chunk common suffix of ${hb.size} survived a 4-char insertion")
  }

  test("cdcDedupIncremental == full rerun restricted to the batch, through a parquet index round-trip") {
    val boiler = "the quick brown fox jumps over the lazy dog " * 10
    val hist = Seq(
      (1L, boiler + "history one tail content here"),
      (2L, boiler + "history two different ending"),
      (3L, "entirely original historical words " * 8)
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, boiler + "new arrival with the shared head"), // hits history
      // exact new-new duplicates: every chunk shared regardless of
      // where the content-defined boundaries fall
      (11L, "fresh boilerplate block repeated " * 9 + "alpha"),
      (12L, "fresh boilerplate block repeated " * 9 + "alpha"),
      (13L, "jabber wock snark boojum frabjous vorpal galumph " * 6)
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("cdcidx").toString
    TextOps.cdcIndex(hist).write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    def key(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_shared"),
        r.getAs[Long]("shared_chars"))
    val got = TextOps.cdcDedupIncremental(fresh, idx).collect().map(key).toMap
    // full rerun, replicating the batch cdc_dedup stats
    val all = TextOps.cdcChunks(hist.unionByName(fresh))
    val nd = all.groupBy(col("chunk_md5"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    val want = all.join(nd, Seq("chunk_md5"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"),
        sum(when(col("nd") > 1, col("len").cast("long")).otherwise(0L))
          .as("shared_chars"))
      .filter(col("doc_id") >= 10L).collect().map(key).toMap
    assert(got == want)
    // semantics landed: history hit, new-new share, loner clean
    assert(got(10L)._2 > 0 && got(11L)._2 > 0 && got(13L)._2 == 0)
  }

  test("cdcChunks dataframe operator tiles and is shuffle-free") {
    val docs = Seq((1L, "spark window merge join " * 15), (2L, "x"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextOps.cdcChunks(docs)
    val rows = out.collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc(1L).map(_.getInt(3)).sum == ("spark window merge join " * 15).length)
    assert(byDoc(2L).map(r => (r.getInt(2), r.getInt(3))).toSeq == Seq((1, 1)))
    assert(!byDoc.contains(3L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cdcChunks must not shuffle:\n$plan")
  }
}
