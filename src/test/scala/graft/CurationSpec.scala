package graft

import org.apache.spark.sql.functions._

import graft.scale.{Curation, TextOps}

/** Semantics checks for the corpus-curation operators on planted inputs:
  * repetition stats on known token streams, PII extraction/redaction on
  * planted PII, deterministic sampling invariants, exact quantiles, and
  * the end-to-end curation verdict. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "a a a a a a a a a a"), // 10 tokens, 1 unique, all bigrams "a a"
    (1L, "one two three four five six seven eight nine ten"), // all unique
    (2L, "x y x y x y x y x y"), // alternating: 2 unique, 2 distinct bigrams
    (3L, "solo")
  ).toDF("doc_id", "text")

  test("repetitionStats: planted repetition ratios are exact") {
    val r = TextOps.repetitionStats(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_tokens") == 10)
    assert(r(0L).getAs[Double]("unique_token_ratio") == 0.1)
    assert(r(0L).getAs[Double]("top_token_fraction") == 1.0)
    // 9 bigrams, 1 distinct -> 1 - 1/9 = 0.8889
    assert(r(0L).getAs[Double]("dup_bigram_fraction") == 0.8889)
    assert(r(1L).getAs[Double]("unique_token_ratio") == 1.0)
    assert(r(1L).getAs[Double]("top_token_fraction") == 0.1)
    assert(r(1L).getAs[Double]("dup_bigram_fraction") == 0.0)
    // alternating x y: 9 bigrams, 2 distinct ("x y", "y x")
    assert(r(2L).getAs[Double]("dup_bigram_fraction") == 0.7778)
    // single token: no bigrams -> fraction 0 by definition
    assert(r(3L).getAs[Long]("n_tokens") == 1)
    assert(r(3L).getAs[Double]("dup_bigram_fraction") == 0.0)
  }

  test("piiStats and redactPii find and remove planted PII") {
    val pii = Seq(
      (0L, "reach me at jane.doe+spam@corp.example.org or 192.168.1.17 " +
        "or 555-123-4567 thanks"),
      (1L, "no pii here just words"),
      (2L, "two mails a@b.co c@d.io one ip 10.0.0.1")
    ).toDF("doc_id", "text")
    val s = TextOps.piiStats(pii).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(s(0L).getAs[Long]("n_emails") == 1)
    assert(s(0L).getAs[Long]("n_ips") == 1)
    assert(s(0L).getAs[Long]("n_phones") == 1)
    assert(s(1L).getAs[Long]("n_emails") == 0)
    assert(s(2L).getAs[Long]("n_emails") == 2)
    assert(s(2L).getAs[Long]("n_ips") == 1)
    val red = pii.select(TextOps.redactPii(col("text")).as("t"))
      .collect().map(_.getString(0))
    assert(red(0) == "reach me at <EMAIL> or <IP> or <PHONE> thanks")
    assert(red(1) == "no pii here just words")
    assert(red(2) == "two mails <EMAIL> <EMAIL> one ip <IP>")
  }

  test("hashSample: deterministic, subset-monotone in rate") {
    val ids = (0L until 1000L).toDF("doc_id")
    val s10 = Curation.hashSample(ids, 0.1).collect().map(_.getLong(0)).toSet
    val s30 = Curation.hashSample(ids, 0.3).collect().map(_.getLong(0)).toSet
    assert(s10 == Curation.hashSample(ids, 0.1).collect().map(_.getLong(0)).toSet)
    assert(s10.subsetOf(s30), "larger rate must be a superset (same seed)")
    // rate is approximate but the hash is uniform: 10% ± 4pp on n=1000
    assert(s10.size > 60 && s10.size < 140, s"got ${s10.size}")
    // a different seed draws a genuinely different sample
    val other = Curation.hashSample(ids, 0.1, seed = 8)
      .collect().map(_.getLong(0)).toSet
    assert(other != s10)
  }

  test("stratifiedSample: exactly n per stratum, deterministic") {
    val df = (0L until 300L).map(i => (i, "s" + (i % 3))).toDF("doc_id", "grp")
    val got = Curation.stratifiedSample(df, "grp", 7)
    assert(got.groupBy("grp").count().collect()
      .forall(_.getAs[Long]("count") == 7))
    val a = got.orderBy("grp", "rn").collect().map(_.getAs[Long]("doc_id")).toSeq
    val b = Curation.stratifiedSample(df, "grp", 7)
      .orderBy("grp", "rn").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(a == b)
  }

  test("mixSample: per-stratum rates apply; missing strata drop") {
    val df = (0L until 400L).map(i => (i, if (i < 300) "big" else "small"))
      .toDF("doc_id", "grp")
    val rates = Seq(("big", 0.2), ("small", 1.0)).toDF("grp", "rate")
    val got = Curation.mixSample(df, rates, "grp")
    val byGrp = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    assert(byGrp("small") == 100, "rate 1.0 keeps everything")
    assert(byGrp("big") > 30 && byGrp("big") < 90, s"got ${byGrp("big")}")
    val missing = Curation.mixSample(df, rates.filter(col("grp") === "big"), "grp")
    assert(missing.filter(col("grp") === "small").isEmpty,
      "strata without a rate are dropped")
  }

  test("groupQuantiles: exact interpolated quantiles per group") {
    // group g: values 0..10 -> p50 = 5, p25 = 2.5; group h: constant
    val df = ((0 to 10).map(v => ("g", v.toDouble)) ++
      Seq(("h", 4.0), ("h", 4.0))).toDF("grp", "v")
    val q = Curation.groupQuantiles(df, "v", "grp", Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(q("g").getAs[Double]("p25") == 2.5)
    assert(q("g").getAs[Double]("p50") == 5.0)
    assert(q("g").getAs[Double]("p90") == 9.0)
    assert(q("h").getAs[Double]("p50") == 4.0)
  }

  test("unigramLogProb: in-distribution text scores lower NLL than OOV text") {
    val train = Seq((100L, "alpha beta gamma alpha beta alpha"))
      .toDF("doc_id", "text")
    val score = Seq(
      (0L, "alpha alpha alpha"), // most frequent token: lowest NLL
      (1L, "gamma gamma gamma"), // rarer token
      (2L, "zzz qqq www") // fully OOV: smoothing floor
    ).toDF("doc_id", "text")
    val r = TextOps.unigramLogProb(score, train).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_tokens") == 3)
    val (a, g, o) = (r(0L).getAs[Double]("mean_nll"),
      r(1L).getAs[Double]("mean_nll"), r(2L).getAs[Double]("mean_nll"))
    assert(a < g && g < o, s"expected NLL(alpha) < NLL(gamma) < NLL(oov): $a $g $o")
    // exact values: p(alpha) = (3+1)/(6+3), p(gamma) = (1+1)/9, p(oov) = 1/9
    assert(a == math.rint(-math.log(4.0 / 9) * 1e4) / 1e4)
    assert(o == math.rint(-math.log(1.0 / 9) * 1e4) / 1e4)
  }

  test("minhashEstimate: exact dups estimate 1.0; estimate filters candidates") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the very lazy dog again and again")
    ).toDF("doc_id", "text")
    val sigs = graft.scale.Dedup.minhashSignatures(corpus)
    val pairs = graft.scale.Dedup.minhashLshPairs(sigs)
    val est = graft.scale.Dedup.minhashEstimate(pairs, sigs).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(est((0L, 1L)) == 1.0, "identical docs must agree on every seed")
    est.get((0L, 2L)).foreach(e => assert(e < 1.0 && e > 0.0))
    // verification stage: a high threshold keeps only the exact-dup pair
    val strict = graft.scale.Dedup.minhashEstimate(pairs, sigs, minEstimate = 0.99)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(strict == Set((0L, 1L)))
  }

  test("LSH bucket cap: star decomposition bounds pairs, components unchanged") {
    val viral = "the quick brown fox jumps over the lazy dog again and again"
    val corpus = ((0L until 40L).map(i => (i, viral)) :+
      (100L, "completely different content about spark query engines at scale"))
      .toDF("doc_id", "text")
    val sigs = graft.scale.Dedup.minhashSignatures(corpus)
    val clique = graft.scale.Dedup.minhashLshPairs(sigs)
    val star = graft.scale.Dedup.minhashLshPairs(sigs, maxBucketSize = 5)
    // 40 identical docs: clique = C(40,2) = 780 pairs; star = 39 hub edges
    assert(clique.count() == 780)
    assert(star.count() == 39)
    val comp = (p: org.apache.spark.sql.DataFrame) =>
      graft.scale.Dedup.connectedComponents(p).collect()
        .map(r => (r.getAs[Long]("node"), r.getAs[Long]("component"))).toSet
    assert(comp(clique) == comp(star), "dedup clusters must be identical")
    val retained = graft.scale.Dedup.dropNearDuplicates(
      corpus, star).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(retained == Set(0L, 100L))
  }

  test("product quantization: identical structure shares codes, ADC ranks right") {
    import graft.scale.Similarity
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f, 0f, 1f, 1f, 1f, 1f)),
      (1L, Array(0.1f, 0f, 0f, 0f, 1f, 1f, 1f, 0.9f)), // near 0
      (2L, Array(5f, 5f, 5f, 5f, -3f, -3f, -3f, -3f)),
      (3L, Array(5.1f, 5f, 5f, 5f, -3f, -3f, -3.1f, -3f)) // near 2
    ).toDF("vec_id", "embedding")
    val cbs = Similarity.pqFit(vecs, m = 2, k = 2, iterations = 2)
    assert(cbs.length == 2 && cbs(0).length == 2 && cbs(0)(0).length == 4)
    val codes = Similarity.pqEncode(vecs, cbs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(codes(0L) == codes(1L), "planted neighbors share all codes")
    assert(codes(2L) == codes(3L))
    assert(codes(0L) != codes(2L), "distinct clusters get distinct codes")
    val top = Similarity.pqTopK(Similarity.pqEncode(vecs, cbs),
      vecs.filter(col("vec_id") === 0L), cbs, k = 3).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(top.head.getAs[Long]("neighbor_id") == 1L,
      "ADC must rank the same-code vector first")
    assert(top.head.getAs[Double]("approx_dist") <
      top.last.getAs[Double]("approx_dist"))
  }

  test("packBatches: budget boundaries and shard isolation are exact") {
    // one shard (ids all ≡ 1 mod 8), 3-token docs, budget 5:
    // doc 1 starts at 0 → batch 0; doc 9 starts at 3 → batch 0;
    // doc 17 starts at 6 → batch 1; doc 25 starts at 9 → batch 1
    val docs = Seq(1L, 9L, 17L, 25L).map(i => (i, "a b c")) :+
      (2L, "x y z p q") // different shard: its own cumsum starts at 0
    val got = Curation.packBatches(docs.toDF("doc_id", "text"), budgetTokens = 5L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tokens_before"), r.getAs[Long]("batch_id"))).toMap
    assert(got(1L) == (0L, 0L) && got(9L) == (3L, 0L))
    assert(got(17L) == (6L, 1L) && got(25L) == (9L, 1L))
    assert(got(2L) == (0L, 0L), "other shard unaffected by shard 1's stream")
  }

  test("ivf-pq: probed-list ADC finds the planted neighbor") {
    import graft.scale.Similarity
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f, 0f, 1f, 1f, 1f, 1f)),
      (1L, Array(0.1f, 0f, 0f, 0f, 1f, 1f, 1f, 0.9f)),
      (2L, Array(5f, 5f, 5f, 5f, -3f, -3f, -3f, -3f)),
      (3L, Array(5.1f, 5f, 5f, 5f, -3f, -3f, -3.1f, -3f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.ivfPqTopK(vecs, vecs.filter(col("vec_id") === 0L),
      k = 1, nClusters = 2, iterations = 2, nprobe = 1,
      m = 2, kCodes = 2, pqIterations = 2).collect()
    assert(top.length == 1 && top.head.getAs[Long]("neighbor_id") == 1L,
      "nprobe=1 restricts to vec 0's own list, where 1 is nearest")
  }

  test("decontaminate: leaked benchmark text is flagged, clean text is not") {
    val bench = Seq((1000L, "the capital of france is paris obviously"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "trivia time the capital of france is paris obviously he said"), // leaked
      (1L, "a completely unrelated document about sorting networks"),
      (2L, "the capital of nowhere") // shares < 2 shingles
    ).toDF("doc_id", "text")
    val v = graft.scale.Curation.decontaminate(corpus, bench).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared_shingles"), r.getAs[Int]("contaminated"))).toMap
    assert(v(0L)._2 == 1 && v(0L)._1 >= 4, s"leak not flagged: ${v(0L)}")
    assert(v(1L) == (0L, 0))
    assert(v(2L)._2 == 0)
  }

  test("chunkDocs: stride windows cover every token, last chunk clipped") {
    val docs = Seq(
      (0L, (1 to 10).map("t" + _).mkString(" ")), // 10 tokens
      (1L, "a b c") // shorter than one chunk
    ).toDF("doc_id", "text")
    val ch = Curation.chunkDocs(docs, chunkTokens = 4, stride = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"),
          r.getAs[String]("chunk_text"))).toMap
    // doc 0: chunks at 1-4, 4-7, 7-10 (stride 3, size 4, last clipped)
    assert(ch((0L, 0L)) == (1L, 4L, "t1 t2 t3 t4"))
    assert(ch((0L, 1L)) == (4L, 7L, "t4 t5 t6 t7"))
    assert(ch((0L, 2L)) == (7L, 10L, "t7 t8 t9 t10"))
    assert(!ch.contains((0L, 3L)))
    assert(ch((1L, 0L)) == (1L, 3L, "a b c"), "short doc = one clipped chunk")
    // coverage: every token index inside some chunk
    assert((1 to 10).forall(i => ch.exists { case ((d, _), (s, e, _)) =>
      d == 0L && s <= i && i <= e }))
  }

  test("curate: retention = quality AND repetition AND not near-dup-loser") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"), // dup loser
      (2L, "spam spam spam spam spam spam spam spam spam spam"), // repetitive
      (3L, "a genuinely varied sentence with many distinct interesting words here")
    ).toDF("doc_id", "text")
    val v = Curation.curate(corpus, minQuality = 0.0, minUniqueRatio = 0.3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(v.size == 4, "one verdict row per input document")
    assert(v(0L).getAs[Boolean]("retained"), "dedup representative survives")
    assert(v(1L).getAs[Boolean]("is_near_dup") && !v(1L).getAs[Boolean]("retained"))
    assert(!v(2L).getAs[Boolean]("retained"), "repetitive doc dropped")
    assert(v(3L).getAs[Boolean]("retained"))
  }

  test("budgetedShards: budgets bound each source's shard mass; schedule interleaves by weight") {
    // identical text per source → equal quality, so the budget fill order
    // is plain id order and the kept set is hand-computable: srcA docs
    // are 4 tokens each with budget 10 → cum_before 0,4,8 kept (3 docs,
    // 12 tokens: the boundary doc overflows by ≤ its own length); srcB
    // keeps all 6 under the default budget
    val rows = (0L until 10L).map(i => (i, "t1 t2 t3 t4", "srcA")) ++
      (100L until 106L).map(i => (i, "u1 u2 u3 u4", "srcB"))
    val df = rows.toDF("doc_id", "text", "source")
    val got = Curation.budgetedShards(df, Seq("srcA" -> 10L),
        defaultBudget = 100L, weights = Seq("srcA" -> 2, "srcB" -> 1),
        docsPerShard = 2)
      .orderBy(col("pos")).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("source"),
        r.getAs[Long]("shard_id"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens")))
    // per-source mass respects budget + one-doc overflow
    val bySrc = got.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    assert(bySrc("srcA") == 12L) // 10-token budget, 4-token boundary doc
    assert(bySrc("srcB") == 24L) // all 6 docs
    // no shard exceeds docsPerShard; srcA's 3 survivors pack into 2+1
    assert(got.forall(_._4 <= 2L))
    assert(got.filter(_._2 == "srcA").map(_._4).toSeq == Seq(2L, 1L))
    // smooth weighted round-robin: keys srcA=(1,2), srcB=(2,4,6) →
    // exact schedule A0 A1 B0 B1 B2 (source asc breaks the key-2 tie)
    assert(got.map(g => (g._2, g._3)).toSeq ==
      Seq(("srcA", 0L), ("srcA", 1L), ("srcB", 0L), ("srcB", 1L), ("srcB", 2L)))
  }

  test("bigramLogProb: scrambled text scores worse than fluent text with the SAME unigrams") {
    // the property unigram LM cannot express: doc 10 reuses doc-train
    // bigrams verbatim; doc 11 is the same multiset of words shuffled so
    // its bigrams are unseen — bigram NLL must separate them
    val train = (0L until 5L).map(i => (i, "the cat sat on the mat"))
    val probe = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "mat the on sat cat the"))
    val got = graft.scale.TextOps.bigramLogProb(
        (train ++ probe).toDF("doc_id", "text"),
        train.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("mean_nll")).toMap
    assert(got(10L) < got(11L),
      s"fluent ${got(10L)} must beat scrambled ${got(11L)}")
    // the unigram score CANNOT separate them (same token multiset)
    val uni = graft.scale.TextOps.unigramLogProb(
        probe.toDF("doc_id", "text"), train.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("mean_nll")).toMap
    assert(math.abs(uni(10L) - uni(11L)) < 1e-9)
  }

  test("clusterOutliers: the planted far point is its cluster's rank-1 outlier") {
    import graft.scale.Similarity
    val tight = (0L until 6L).map(i =>
      (i, Array(1.0f + i * 0.001f, 0.0f)))
    val far = Seq((99L, Array(3.0f, 2.0f))) // same side of space, far out
    val other = (200L until 206L).map(i => (i, Array(-1.0f, 0.0f - (i - 200) * 0.001f)))
    val df = (tight ++ far ++ other).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(df, k = 2)
    val got = Similarity.clusterOutliers(df, cents, topN = 2)
      .collect().map(r => (r.getAs[Int]("cluster"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("vec_id")).toMap
    // 99 sits with the positive-x cluster and must be its top outlier
    val cl99 = Similarity.kmeansAssign(df, cents)
      .filter(col("vec_id") === 99L).collect()(0).getInt(1)
    assert(got((cl99, 1)) == 99L)
    // ranks are dense per cluster and bounded by topN
    assert(got.keys.forall(_._2 <= 2))
  }

  test("corpusDiff: each change class lands exactly once") {
    val a = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val b = Seq((1L, "one"), (2L, "two EDITED"), (4L, "four")).toDF("doc_id", "text")
    val got = Curation.corpusDiff(a, b).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("splitNgramOverlap: only shingles present in 2+ splits count as shared") {
    // split 0: "a b c" → shingle "a b c"; split 1: "a b c" (shared) and
    // "x y z" (unique to split 1)
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val splits = Seq((1L, 0), (2L, 1), (3L, 1)).toDF("doc_id", "split")
    val got = Curation.splitNgramOverlap(docs, splits).collect()
      .map(r => r.getAs[Int]("split") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_shared"),
          r.getAs[Long]("shared_micro"))).toMap
    assert(got(0) == ((1L, 1L, 1000000L))) // its only shingle is shared
    assert(got(1) == ((2L, 1L, 500000L))) // one of two shared
  }

  test("gopherRules: each planted violation trips exactly its rule") {
    val good = "the cat and the dog walk to the park in the morning light"
    val rows = Seq(
      (0L, good), // passes everything (12 words, sane lengths, stopwords)
      (1L, "too short"), // word count
      (2L, "a b c d e f g h i j k l"), // mean word len < 3
      (3L, "# # # the cat and of to in is that for runs fast"), // hash ratio
      (4L, "the cat ... and ... dog ... to ... in ... is ... sits ..."), // ellipsis
      (5L, "1 2 3 4 5 6 7 8 9 10 11 12"), // alpha words
      (6L, "cat dog walk park light morning stream river trees stone hill path"), // no stopwords
      (7L, "   ab  cd  ef  gh  ij   ")) // padded whitespace must not rescue mean word len
    val got = graft.scale.TextOps.gopherRules(rows.toDF("doc_id", "text"),
        minWords = 5L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Boolean]("pass"))
    assert(!got(1L).getAs[Boolean]("r_word_count"))
    assert(!got(2L).getAs[Boolean]("r_mean_word_len"))
    assert(!got(3L).getAs[Boolean]("r_hash_ratio"))
    assert(!got(4L).getAs[Boolean]("r_ellipsis_ratio"))
    assert(!got(5L).getAs[Boolean]("r_alpha_words"))
    assert(!got(6L).getAs[Boolean]("r_stopwords"))
    // chars are counted from non-whitespace, not raw length: the old
    // length(t)-(n-1) shortcut would credit doc 7's padding as word chars
    // (20 >= 3*5) and wrongly pass the mean-word-length rule
    assert(!got(7L).getAs[Boolean]("r_mean_word_len"))
    (1L to 7L).foreach(i => assert(!got(i).getAs[Boolean]("pass"), s"doc $i"))
  }

  test("distinctNgrams: hand-computed totals and ratios") {
    // srcA: "a b a b" + "a b" → unigrams total 6, distinct 2 (ratio 333333)
    // bigrams: doc0 gives [a b, b a, a b] (3), doc1 gives [a b] (1):
    // total 4, distinct 2 → 500000
    val rows = Seq((0L, "a b a b", "srcA"), (1L, "a b", "srcA"))
    val got = graft.scale.TextOps.distinctNgrams(
        rows.toDF("doc_id", "text", "source"), ns = Seq(1, 2))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Int]("n")) ->
        (r.getAs[Long]("total"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("ratio_micro"))).toMap
    assert(got(("srcA", 1)) == ((6L, 2L, 333333L)))
    assert(got(("srcA", 2)) == ((4L, 2L, 500000L)))
  }

  test("mixPlan: targets, epochs and deficits are exact integers") {
    // srcA has 8 tokens, srcB has 2; weights 3:1, budget 12 →
    // targets 9 and 3; srcA allocates 8 (deficit 1, epochs 1.125e6);
    // srcB allocates 2 (deficit 1, epochs 1.5e6)
    val rows = Seq(
      (0L, "t1 t2 t3 t4", "srcA"), (1L, "t1 t2 t3 t4", "srcA"),
      (2L, "u1 u2", "srcB"))
    val got = Curation.mixPlan(rows.toDF("doc_id", "text", "source"),
        Seq("srcA" -> 3, "srcB" -> 1), budgetTokens = 12L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("avail_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("alloc_tokens"), r.getAs[Long]("epochs_micro"),
          r.getAs[Long]("deficit"))).toMap
    assert(got("srcA") == ((8L, 9L, 8L, 1125000L, 1L)))
    assert(got("srcB") == ((2L, 3L, 2L, 1500000L, 1L)))
  }

  test("softDedupWeights: duplicated content gets reciprocal weight") {
    // docs 0 and 1 identical (every shingle df=2); doc 2 unique (df=1)
    val rows = Seq(
      (0L, "x y z w"), (1L, "x y z w"), (2L, "p q r s"))
    val got = graft.scale.Dedup.softDedupWeights(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("mean_df_micro"), r.getAs[Long]("weight_micro"))).toMap
    assert(got(0L) == ((2000000L, 500000L)) && got(1L) == got(0L))
    assert(got(2L) == ((1000000L, 1000000L)))
  }

  test("temperature sampling keeps the smallest stratum whole") {
    // stratum "small" (4 docs, rate 1.0) vs "big" (400 docs, rate 0.1)
    val docs = ((0L until 4L).map(i => (i, "small")) ++
      (100L until 500L).map(i => (i, "big"))).toDF("doc_id", "lang")
    val kept = Curation.temperatureSample(docs, "lang")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val bySt = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySt("small") == 4, "rate (nmin/nmin)^0.5 = 1 keeps everything")
    // big stratum: rate = (4/400)^0.5 = 0.1 → expect ~40, hash-determined
    assert(bySt("big") > 10 && bySt("big") < 100)
    // deterministic: same input, same sample
    val again = Curation.temperatureSample(docs, "lang")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    assert(kept.sorted.toSeq == again.sorted.toSeq)
  }

  test("temperature sampling of an empty corpus is empty, not a crash") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(Curation.temperatureSample(docs, "lang").count() == 0)
  }

  test("packContexts: hand-computed packing, boundary docs span examples") {
    // token stream in doc_id order: doc0 [0,3) doc1 [3,5) doc2 [5,6)
    // doc3 [6,11) — seqLen 4:
    //   e0 = tokens [0,4): doc0 (3) + doc1 (1)           → fill 4
    //   e1 = tokens [4,8): doc1 (1) + doc2 (1) + doc3 (2) → fill 4
    //   e2 = tokens [8,12): doc3 (3)                      → fill 3, pad 1
    val d = Seq((0L, "a b c"), (1L, "d e"), (2L, "f"), (3L, "g h i j k"))
      .toDF("doc_id", "text")
    val got = Curation.packContexts(d, 4).orderBy(col("example_id"))
      .collect().map(r => (r.getAs[Long]("example_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("first_doc"),
        r.getAs[Long]("last_doc"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_pad")))
    assert(got.toSeq == Seq(
      (0L, 2L, 0L, 1L, 4L, 0L),
      (1L, 3L, 1L, 3L, 4L, 0L),
      (2L, 1L, 3L, 3L, 3L, 1L)))
  }

  test("packContexts: orderCol repacks the same tokens in stream order") {
    // stream order REVERSES the ids: doc3 (5) doc2 (1) doc1 (2) doc0 (3)
    // seqLen 4: e0 = doc3[0,4) fill 4; e1 = doc3(1) + doc2(1) + doc1(2)
    // fill 4; e2 = doc0(3) fill 3 pad 1 — first/last report ids at the
    // STREAM boundaries (arg-min/max by pos), not numeric min/max
    val d = Seq((0L, "a b c", 3L), (1L, "d e", 2L), (2L, "f", 1L),
      (3L, "g h i j k", 0L)).toDF("doc_id", "text", "pos")
    val got = Curation.packContexts(d, 4, orderCol = "pos")
      .orderBy(col("example_id"))
      .collect().map(r => (r.getAs[Long]("example_id"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("first_doc"),
        r.getAs[Long]("last_doc"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_pad")))
    assert(got.toSeq == Seq(
      (0L, 1L, 3L, 3L, 4L, 0L),
      (1L, 3L, 3L, 1L, 4L, 0L),
      (2L, 1L, 0L, 0L, 3L, 1L)))
  }

  test("packContexts: result is invariant to the input's physical partitioning") {
    // the distributed prefix sum must not depend on how rows land in
    // partitions — range-sort first, offsets per sorted partition
    val d = (0L until 200L).map(i => (i, ("tok " * (1 + (i % 7).toInt)).trim))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      Curation.packContexts(df, 32).collect().map(_.toString).sorted.toSeq
    val base = rows(d.coalesce(1))
    assert(rows(d.repartition(13)) == base)
    assert(rows(d.repartition(3, col("text"))) == base)
    assert(base.nonEmpty)
  }

  test("packBoundaries: offsets, ids and spill flags by hand") {
    // stream: doc0 [0,3) doc1 [3,5) doc2 [5,6) doc3 [6,11) — seqLen 4:
    // doc0 starts e0@0 (stays), doc1 e0@3 (spills into e1), doc2 e1@1,
    // doc3 e1@2 (spills into e2)
    val d = Seq((0L, "a b c"), (1L, "d e"), (2L, "f"), (3L, "g h i j k"))
      .toDF("doc_id", "text")
    val got = Curation.packBoundaries(d, 4)
      .orderBy(col("example_id"), col("start_offset"))
      .collect().map(r => (r.getAs[Long]("example_id"),
        r.getAs[Long]("start_offset"), r.getAs[Long]("doc_id"),
        r.getAs[Boolean]("spans_next")))
    assert(got.toSeq == Seq(
      (0L, 0L, 0L, false), (0L, 3L, 1L, true),
      (1L, 1L, 2L, false), (1L, 2L, 3L, true)))
  }

  test("packBoundaries agrees with packContexts: starts + carry-in = n_docs") {
    // exactly ONE document contains any given token position, so the
    // carry-in to example e is 1 iff e > 0 and no document starts at
    // offset 0 of e (the straddling doc), else 0 — and every doc
    // packContexts counts either starts in e or carries in
    val d = (0L until 150L).map(i => (i, ("w " * (1 + (i % 9).toInt)).trim))
      .toDF("doc_id", "text")
    val ctx = Curation.packContexts(d, 16).collect()
      .map(r => r.getAs[Long]("example_id") -> r.getAs[Long]("n_docs")).toMap
    val bnd = Curation.packBoundaries(d, 16).collect()
    val starts = bnd.groupBy(_.getAs[Long]("example_id"))
      .view.mapValues(_.length.toLong).toMap
    val hasZeroOffset = bnd.filter(_.getAs[Long]("start_offset") == 0L)
      .map(_.getAs[Long]("example_id")).toSet
    for ((e, n) <- ctx) {
      val carryIn = if (e > 0 && !hasZeroOffset(e)) 1L else 0L
      assert(starts.getOrElse(e, 0L) + carryIn == n, s"example $e")
    }
    assert(bnd.exists(_.getAs[Boolean]("spans_next")))
  }

  test("packBestFit: hand-computed BFD — tightest fit, lowest bin on ties") {
    // capacity 10, sizes desc: 7(a) 6(b) 5(c) 4(d) 3(e) 2(f).
    // a→bin0(rem3) b→bin1(rem4) c→bin2(rem5) d→bin1(rem0)
    // e→bin0(rem0) f→bin2(rem3)
    val items = Seq(("a", 7L), ("b", 6L), ("c", 5L), ("d", 4L),
      ("e", 3L), ("f", 2L)).zipWithIndex
      .map { case ((_, n), i) => (i.toLong, n) }.toDF("doc_id", "n_tokens")
    val got = Curation.packBestFit(items, 10)
      .orderBy(col("doc_id")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin_id")).toSeq
    assert(got == Seq(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L,
      4L -> 0L, 5L -> 2L))
  }

  test("packBestFit: groups pack independently; capacity never exceeded") {
    val items = (0L until 300L)
      .map(i => (i, 1L + i % 97, s"g${i % 4}"))
      .toDF("doc_id", "n_tokens", "grp")
    val got = Curation.packBestFit(items, 100, groupCol = "grp")
    assert(got.count() == 300)
    val fills = got.groupBy(col("grp"), col("bin_id"))
      .agg(sum(col("n_tokens")).as("fill")).collect()
    assert(fills.forall(_.getAs[Long]("fill") <= 100L))
    // BFD can never use more bins than one-item-per-bin, and for this
    // size mix must beat it by a wide margin (fill rate > 75%)
    val nBins = got.select(col("grp"), col("bin_id")).distinct().count()
    val tok = (0L until 300L).map(i => 1L + i % 97).sum
    assert(nBins * 100L < tok * 4 / 3, s"fill rate too low: $nBins bins")
  }

  test("packBestFit rejects oversize and non-positive items") {
    val items = Seq((1L, 11L)).toDF("doc_id", "n_tokens")
    intercept[Exception] { Curation.packBestFit(items, 10).collect() }
    val zero = Seq((1L, 0L)).toDF("doc_id", "n_tokens")
    intercept[Exception] { Curation.packBestFit(zero, 10).collect() }
  }

  test("packBestFit enforces the group-size contract loudly, not via OOM") {
    val items = (0L until 50L).map(i => (i, 1L + i % 9))
      .toDF("doc_id", "n_tokens")
    // a group over maxGroupItems fails with guidance naming the contract
    val e = intercept[org.apache.spark.SparkException] {
      Curation.packBestFit(items, 10, maxGroupItems = 10).collect()
    }
    assert(e.getMessage.contains("maxGroupItems") ||
      Option(e.getCause).exists(_.getMessage.contains("maxGroupItems")))
    // exactly at the bound is fine
    assert(Curation.packBestFit(items, 10, maxGroupItems = 50).count() == 50)
    intercept[IllegalArgumentException] {
      Curation.packBestFit(items, 10, maxGroupItems = 0)
    }
  }

  test("packContexts: total fill equals the corpus token count at any width") {
    val d = Seq((0L, "a b c"), (1L, "d e"), (2L, "f"), (3L, "g h i j k"))
      .toDF("doc_id", "text")
    for (w <- Seq(1, 3, 7, 100)) {
      val rows = Curation.packContexts(d, w).collect()
      assert(rows.map(_.getAs[Long]("n_tokens")).sum == 11L, s"width $w")
      // only the FINAL example may pad
      val padded = rows.filter(_.getAs[Long]("n_pad") > 0)
      assert(padded.length <= 1)
      padded.foreach(p => assert(p.getAs[Long]("example_id") ==
        rows.map(_.getAs[Long]("example_id")).max))
    }
  }
}
