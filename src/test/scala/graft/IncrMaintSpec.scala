package graft

import org.apache.spark.sql.functions._

import graft.scale.{Curation, Dedup, TextOps}

/** Semantics checks for the round-6 curation additions: maximal
  * duplicated regions (interval union of duplicated span positions),
  * incremental aggregate maintenance under a snapshot diff, and CCNet
  * head/middle/tail perplexity bucketing. */
class IncrMaintSpec extends SparkSpec {
  import spark.implicits._

  test("maximalDupSpans: consecutive duplicated positions merge to one region") {
    val docs = Seq(
      (0L, "p q r s t u"),             // trigrams @1..3 all shared with doc 1
      (1L, "p q r s t m"),
      (2L, "aa bb cc xx yy zz p q r"), // two separated shared blocks
      (3L, "aa bb cc qq ww ee p q r"),
      (4L, "solo only tokens here now") // nothing shared -> absent
    ).toDF("doc_id", "text")
    val r = Dedup.maximalDupSpans(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 0: dup positions {1,2,3} -> one region [1, 5]
    assert(r(0L).getAs[Long]("n_regions") == 1)
    assert(r(0L).getAs[Long]("dup_tokens") == 5)
    assert(r(0L).getAs[Long]("max_region") == 5)
    // doc 2: dup positions {1, 7} -> [1,3] and [7,9]
    assert(r(2L).getAs[Long]("n_regions") == 2)
    assert(r(2L).getAs[Long]("dup_tokens") == 6)
    assert(r(2L).getAs[Long]("max_region") == 3)
    assert(!r.contains(4L))
  }

  test("maximalDupSpans: gap of exactly k merges, larger gap splits") {
    val docs = Seq(
      (0L, "a b c d e f g"),   // shared @1 ("a b c") and @5 ("e f g")... via doc 1
      (1L, "a b c zz d e f g")
    ).toDF("doc_id", "text")
    val r = Dedup.maximalDupSpans(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 0 trigrams: @1 "a b c" (shared), @5 "e f g" (shared via doc1 @6);
    // also @3 "c d e"? doc1 has "c zz d" - not shared. @5 > 1+3 -> split.
    // Wait: doc1 trigrams: "a b c","b c zz","c zz d","zz d e","d e f","e f g"
    // doc0 trigrams: "a b c"@1,"b c d"@2,"c d e"@3,"d e f"@4,"e f g"@5
    // shared for doc0: @1, @4, @5 -> 4 <= 1+3 merges, 5 <= 4+3 merges
    // -> ONE region [1, 7] covering the whole doc
    assert(r(0L).getAs[Long]("n_regions") == 1)
    assert(r(0L).getAs[Long]("dup_tokens") == 7)
    // doc 1: shared @1 ("a b c"), @5 ("d e f"), @6 ("e f g");
    // 5 > 1+3 -> split: [1,3] and [5,8]
    assert(r(1L).getAs[Long]("n_regions") == 2)
    assert(r(1L).getAs[Long]("dup_tokens") == 3 + 4)
    assert(r(1L).getAs[Long]("max_region") == 4)
  }

  test("dupSpansRemoved: covered tokens cut, unique docs untouched, full dup yields NULL hash") {
    val docs = Seq(
      (0L, "p q r s t u"),              // fully covered by the shared block
      (1L, "p q r s t u"),              // identical twin -> also fully covered
      (2L, "aa bb cc xx yy zz p q r"),  // [1,3] and [7,9] covered via doc 3
      (3L, "aa bb cc qq ww ee p q r"),
      (4L, "solo only tokens here now") // untouched
    ).toDF("doc_id", "text")
    val r = Dedup.dupSpansRemoved(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // docs 0/1: every position covered -> nothing kept, NULL hash
    assert(r(0L).getAs[Long]("n_kept") == 0)
    assert(r(0L).getAs[Long]("n_removed") == 6)
    assert(r(0L).getAs[String]("clean_hash") == null)
    // doc 2: keeps positions 4..6 = "xx yy zz"
    assert(r(2L).getAs[Long]("n_tokens") == 9)
    assert(r(2L).getAs[Long]("n_kept") == 3)
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(r(2L).getAs[String]("clean_hash") == md5hex("xx yy zz"))
    // doc 4: no dup regions -> text survives byte-for-byte
    assert(r(4L).getAs[Long]("n_removed") == 0)
    assert(r(4L).getAs[String]("clean_hash") ==
      md5hex("solo only tokens here now"))
  }

  test("dupSpansRemovedIncremental == full rerun restricted to the batch, through a parquet index round-trip") {
    val hist = Seq(
      (1L, "p q r s t u extra tail tokens here"),
      (2L, "p q r s t u other words beyond that"),  // shares block with 1
      (3L, "aa bb cc dd ee ff gg hh")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "zz p q r s yy ww vv uu tt"),          // dups vs HISTORY only
      (11L, "mm nn oo pp qq rr ss uniqueword11"),  // dups vs new doc 12
      (12L, "mm nn oo pp qq rr ss uniqueword12"),
      (13L, "totally fresh content nothing shared at all")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shidx").toString
    Dedup.shingleIndex(hist).write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val got = Dedup.dupSpansRemovedIncremental(fresh, idx).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("clean_hash"))).toMap
    val full = Dedup.dupSpansRemoved(hist.unionByName(fresh)).collect()
      .filter(_.getAs[Long]("doc_id") >= 10L)
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("clean_hash"))).toMap
    assert(got == full)
    // and the semantics landed: history-dup cleaned, new-new dup
    // cleaned, fresh doc untouched
    assert(got(10L)._1 < 10 && got(11L)._1 < 8 && got(13L)._1 == 7)
  }

  test("maintainAgg: maintained aggregate equals direct aggregation over B") {
    val a = Seq(
      (1L, "s0", "one two three"),
      (2L, "s0", "four five"),
      (3L, "s1", "six"),
      (4L, "s1", "seven eight nine ten")
    ).toDF("doc_id", "source", "text")
    val b = Seq(
      (1L, "s0", "one two three"),          // unchanged
      (2L, "s0", "four five extended now"), // changed: +2 tokens
      // 3 removed
      (4L, "s1", "seven eight nine ten"),   // unchanged
      (5L, "s2", "brand new doc")           // added (new source!)
    ).toDF("doc_id", "source", "text")
    val base = a.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"))
    val maintained = Curation.maintainAgg(base, Curation.corpusDiff(a, b), a, b)
      .collect().map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"))).toMap
    val direct = b.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"))
      .collect().map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"))).toMap
    assert(maintained == direct)
    // and the delta actually moved things: s1 lost a doc, s2 appeared
    assert(maintained("s1") == ((1L, 4L)))
    assert(maintained("s2") == ((1L, 3L)))
  }

  test("maintainAgg: group moves are maintained even when corpusDiff says 'unchanged'") {
    val a = Seq(
      (1L, "s0", "one two three"),
      (2L, "s0", "four five"),
      (3L, "s1", "six seven")
    ).toDF("doc_id", "source", "text")
    val b = Seq(
      (1L, "s1", "one two three"),       // SAME text, source s0 -> s1:
                                         // diff reports 'unchanged'
      (2L, "s2", "four five extended"),  // changed text AND moved group
      (3L, "s1", "six seven")            // genuinely unchanged
    ).toDF("doc_id", "source", "text")
    val base = a.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"))
    // the diff genuinely misses the doc-1 move (text hash unchanged)
    val diff = Curation.corpusDiff(a, b)
    assert(diff.filter(col("doc_id") === 1L).head()
      .getAs[String]("status") == "unchanged")
    val maintained = Curation.maintainAgg(base, diff, a, b)
      .collect().map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"))).toMap
    val direct = b.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col("text"))).cast("long")).as("n_tokens"))
      .collect().map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"))).toMap
    // s0 drains to (0, 0); s1 gains doc 1's mass; s2 holds moved doc 2
    assert(maintained("s0") == ((0L, 0L)))
    assert(maintained.filter(_._2._1 > 0L) == direct)
  }

  test("pairMaxSharedSpan: diagonal runs find the longest shared block") {
    val docs = Seq(
      // docs 0/1 share the 5-token block "c1 c2 c3 c4 c5" at different
      // offsets, plus an isolated shared trigram "t1 t2 t3"
      (0L, "c1 c2 c3 c4 c5 xx yy t1 t2 t3"),
      (1L, "aa bb c1 c2 c3 c4 c5 zz t1 t2 t3 qq"),
      (2L, "nothing shared here at all")
    ).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L)).toDF("a", "b")
    val r = graft.scale.Dedup.pairMaxSharedSpan(pairs, docs).collect()
    assert(r.length == 1)
    // block run: positions (1..3)x(3..5) on diag -2 -> run 3 -> span 5
    assert(r.head.getAs[Long]("max_span") == 5L)
    // matches: 3 block shingles + 1 trigram "t1 t2 t3" = 4
    assert(r.head.getAs[Long]("n_matches") == 4L)
  }

  test("componentsIncremental: super-graph merge equals full recomputation") {
    // day-1: components {1,2,3} (label 1) and {10,11} (label 10), plus
    // isolated labeled node 20
    val histPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val histLabels = Dedup.connectedComponents(histPairs)
      .unionByName(Seq((20L, 20L)).toDF("node", "component"))
    // day-2: new node 30 bridges the two components; new node 40 pairs
    // with isolated 20; new node 50 joins only itself (singleton edge
    // partner 51, also new)
    val newEdges = Seq((3L, 30L), (30L, 11L), (20L, 40L), (50L, 51L))
      .toDF("a", "b")
    val got = Dedup.componentsIncremental(histLabels, newEdges)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("component")).toMap
    val full = Dedup.connectedComponents(histPairs.unionByName(newEdges))
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("component")).toMap
    assert(got == full)
    // and the merge genuinely happened: 11 now labels 1, not 10
    assert(got(11L) == 1L && got(30L) == 1L && got(40L) == 20L &&
      got(51L) == 50L)
    // both sides of the size gate agree: maxLocalEdges=0 forces the
    // distributed star-contraction fallback
    val distGot = Dedup.componentsIncremental(histLabels, newEdges,
        maxLocalEdges = 0L)
      .collect().map(r => r.getAs[Long]("node") ->
        r.getAs[Long]("component")).toMap
    assert(distGot == full)
  }

  test("ccnetBuckets: fluent docs land in head, unseen-vocab docs in tail") {
    // doc i mixes (10-i) copies of the trained token with one unseen
    // token -> mean NLL strictly increases with i, no boundary ties
    val docs = (1 to 9).map { i =>
      (i.toLong, "en", (Seq.fill(10 - i)("common") :+ s"rare$i").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val train = Seq((100L, "en", "common common common common"))
      .toDF("doc_id", "lang", "text")
    val r = TextOps.ccnetBuckets(docs, train).collect()
      .map(x => x.getAs[String]("bucket") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("sum_tokens"))).toMap
    // n=9: tercile ranks r333=3, r667=7 -> head {1,2,3}, middle {4..7},
    // tail {8,9}
    assert(r("head")._1 == 3)
    assert(r("middle")._1 == 4)
    assert(r("tail")._1 == 2)
    // doc i has 11-i tokens
    assert(r("head")._2 == (10 + 9 + 8))
    assert(r("tail")._2 == (3 + 2))
  }
}
