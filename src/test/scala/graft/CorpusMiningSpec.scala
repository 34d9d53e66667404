package graft

import org.apache.spark.sql.functions._

import graft.scale.{Curation, Dedup, Similarity, TextOps}

/** Semantics checks for the corpus-mining additions on planted inputs:
  * duplicated-span detection (cross-doc k-token spans), DSIR importance
  * weights (sign follows target affinity), BM25 retrieval (term overlap
  * ranks first), and SemDeDup (exact duplicates collapse to one
  * representative per component). */
class CorpusMiningSpec extends SparkSpec {
  import spark.implicits._

  test("duplicatedSpans: only cross-document spans count as duplicated") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),  // shares "alpha beta gamma" with doc 1
      (1L, "alpha beta gamma other"),
      (2L, "solo words only here"),    // no shared trigram
      (3L, "rep rep rep rep rep")      // internal repeats, no other doc has them
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // 4 tokens -> 2 trigram spans; exactly one ("alpha beta gamma") shared
    assert(r(0L).getAs[Long]("n_spans") == 2)
    assert(r(0L).getAs[Long]("n_dup_spans") == 1)
    assert(r(0L).getAs[Double]("dup_ratio") == 0.5)
    assert(r(1L).getAs[Long]("n_dup_spans") == 1)
    assert(r(2L).getAs[Long]("n_dup_spans") == 0)
    // "rep rep rep" appears 3x within doc 3 only: spans counted, none dup
    assert(r(3L).getAs[Long]("n_spans") == 3)
    assert(r(3L).getAs[Long]("n_dup_spans") == 0)
  }

  test("importanceWeights: target-like docs score positive, others negative") {
    // target = science-y docs; raw corpus = science + sports
    val docs = Seq(
      (0L, "quantum physics experiment quantum physics"),
      (1L, "quantum physics theory quantum physics"),
      (2L, "football game score football game"),
      (3L, "football game replay football game")
    ).toDF("doc_id", "text")
    val target = docs.filter($"doc_id" < 2)
    val w = Curation.importanceWeights(docs, target, buckets = 64)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    // science bigrams are ~2x as frequent in target as in raw -> positive;
    // sports bigrams never occur in target -> negative
    assert(w(0L).getAs[Double]("log_ratio") > 0)
    assert(w(1L).getAs[Double]("log_ratio") > 0)
    assert(w(2L).getAs[Double]("log_ratio") < 0)
    assert(w(3L).getAs[Double]("log_ratio") < 0)
    // 5 tokens -> 4 bigram features each
    assert(w(0L).getAs[Long]("n_feats") == 4)
  }

  test("bm25TopK: the doc sharing the query's rare terms ranks first") {
    val docs = Seq(
      (0L, "rare unique signal words"),          // the query
      (1L, "rare unique signal words exactly"),  // near-copy -> best match
      (2L, "rare common words filler filler"),   // partial overlap
      (3L, "totally different content here"),
      (4L, "more unrelated filler text")
    ).toDF("doc_id", "text")
    val top = TextOps.bm25TopK(docs, docs.filter($"doc_id" === 0), k = 3)
      .orderBy($"rank").collect()
    assert(top.head.getAs[Long]("doc_id") == 1L) // full term overlap wins
    assert(top(1).getAs[Long]("doc_id") == 2L)   // partial overlap second
    // self never appears among its own results
    assert(!top.map(_.getAs[Long]("doc_id")).contains(0L))
    // scores decrease with rank
    val scores = top.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("semDeDup: exact duplicates collapse to the min-id representative") {
    // hash-derived pseudo-random components: distinct vectors are far
    // apart with overwhelming margin (sin-lattice vectors can be
    // near-parallel by accident)
    def comp(i: Int, d: Int): Float = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$d".getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59) - 1.0).toFloat
    }
    val base = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(d => comp(i, d)))
    }
    // vectors 20..23 duplicate vectors 0..3 exactly -> near-dup pairs
    val dup = (0 until 4).map { i =>
      ((20 + i).toLong, Array.tabulate(8)(d => comp(i, d)))
    }
    val vecs = (base ++ dup).toDF("vec_id", "embedding")
    val r = Similarity.semDeDup(vecs, threshold = 0.999, nClusters = 4,
      iterations = 3).collect()
      .map(x => x.getAs[Long]("vec_id") -> x).toMap
    (0 until 4).foreach { i =>
      assert(!r(i.toLong).getAs[Boolean]("is_dup"), s"rep $i kept")
      assert(r((20 + i).toLong).getAs[Boolean]("is_dup"), s"copy ${20 + i} dropped")
      // duplicate pair lands in the same cluster (identical vectors)
      assert(r(i.toLong).getAs[Int]("cluster") ==
        r((20 + i).toLong).getAs[Int]("cluster"))
    }
    // everything else untouched
    (4 until 20).foreach { i =>
      assert(r(i.toLong).getAs[Boolean]("retained"))
    }
  }

  test("winnowFingerprint: shared runs >= w+k-1 tokens share a fingerprint") {
    // docs 0 and 1 share an 8-token run (>= w+k-1 = 6) inside different
    // surroundings; doc 2 is unrelated
    val shared = "zeta eta theta iota kappa lambda mu nu"
    val docs = Seq(
      (0L, s"alpha beta $shared gamma delta"),
      (1L, s"one two three $shared four"),
      (2L, "totally different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val fp = TextOps.winnowFingerprint(docs).collect()
    val byDoc = fp.groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.map(_.getAs[Long]("fingerprint")).toSet }
    // winnowing guarantee: at least one fingerprint of the shared run in both
    assert((byDoc(0L) & byDoc(1L)).nonEmpty)
    assert((byDoc(0L) & byDoc(2L)).isEmpty)
    // density: every window of w=4 consecutive shingles yields a selection,
    // so gaps between selected positions are < w+1
    val pos0 = fp.filter(_.getAs[Long]("doc_id") == 0L)
      .map(_.getAs[Long]("pos")).sorted
    pos0.zip(pos0.tail).foreach { case (a, b) => assert(b - a <= 4) }
    // the MOSS match stage surfaces exactly the overlapping pair
    val pairs = TextOps.winnowPairs(docs, minShared = 1).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(pairs.toSet == Set((0L, 1L)))
  }

  test("winnowPairsIncremental == full run's new-touching pairs, through a parquet index round-trip") {
    val shared = "zeta eta theta iota kappa lambda mu nu"
    val shared2 = "omega psi chi phi upsilon tau sigma rho"
    val hist = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared four"),  // hist-hist pair with 1
      (3L, s"prefix $shared2 suffix words")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, s"brand new $shared wrapping text"),   // pairs with hist 1, 2
      (20L, s"other intro $shared2 and an outro"), // pairs with hist 3 and new 30
      (30L, s"yet another $shared2 occurrence doc"),
      (40L, "nothing in common with anybody else at all")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("widx").toString
    TextOps.winnowIndex(hist).write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    for (cap <- Seq(Int.MaxValue, 2)) {
      val got = TextOps.winnowPairsIncremental(fresh, idx, minShared = 1,
          maxFpDf = cap)
        .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Long]("n_shared"))).toSet
      val want = TextOps.winnowPairs(hist.unionByName(fresh), minShared = 1,
          maxFpDf = cap)
        .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Long]("n_shared"))).toSet
        .filter(p => p._1 >= 10 || p._2 >= 10)
      assert(got == want, s"maxFpDf=$cap")
    }
    // semantics landed: hist link, new-new link, loner absent
    val pairs = TextOps.winnowPairsIncremental(fresh, idx, minShared = 1)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs.contains((1L, 10L)) && pairs.contains((20L, 30L)))
    assert(!pairs.exists(p => p._1 == 40L || p._2 == 40L))
  }

  test("knnGraph: exact duplicates are each other's rank-1 neighbor") {
    def comp(i: Int, d: Int): Float = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$d".getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59) - 1.0).toFloat
    }
    val vecs = ((0 until 20).map(i => (i.toLong, Array.tabulate(8)(comp(i, _)))) ++
      (0 until 4).map(i => ((20 + i).toLong, Array.tabulate(8)(comp(i, _)))))
      .toDF("vec_id", "embedding")
    val g = Similarity.knnGraph(vecs, k = 3, nClusters = 4, iterations = 3)
    val rows = g.collect()
    val byId = rows.groupBy(_.getAs[Long]("vec_id"))
    (0 until 4).foreach { i =>
      val top = byId(i.toLong).minBy(_.getAs[Int]("rank"))
      assert(top.getAs[Long]("neighbor_id") == (20 + i).toLong)
      assert(top.getAs[Double]("sim") == 1.0)
    }
    // at most k neighbors each, ranks dense from 1
    byId.values.foreach { ns =>
      assert(ns.length <= 3)
      assert(ns.map(_.getAs[Int]("rank")).sorted.sameElements(1 to ns.length))
    }
  }

  test("knnGraphRefine: one NN-descent round recovers cross-cluster " +
      "neighbors; recall never regresses") {
    def comp(i: Int, d: Int): Float = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$d".getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59) - 1.0).toFloat
    }
    val n = 40
    val raw = (0 until n).map(i => (i.toLong, Array.tabulate(8)(comp(i, _))))
    val vecs = raw.toDF("vec_id", "embedding")
    // brute-force truth under the engine's own ordering convention:
    // rounded 4dp cosine DESC, neighbor id ASC
    def rsim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (d <- a.indices) {
        dot += a(d).toDouble * b(d); na += a(d).toDouble * a(d)
        nb += b(d).toDouble * b(d)
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = raw.toMap
    val truth: Map[Long, Seq[Long]] = raw.map { case (i, vi) =>
      i -> raw.filter(_._1 != i)
        .map { case (j, vj) => (j, rsim(vi, vj)) }
        .sortBy { case (j, s) => (-s, j) }.take(3).map(_._1)
    }.toMap
    def hits(g: org.apache.spark.sql.DataFrame): Int =
      g.select("vec_id", "neighbor_id").as[(Long, Long)].collect()
        .count { case (v, u) => truth(v).contains(u) }
    val base = Similarity.knnGraph(vecs, k = 3, nClusters = 4, iterations = 3)
    val baseHits = hits(base)
    assert(baseHits < 3 * n, "fixture should leave cross-cluster misses " +
      "for the refinement round to recover")
    // the cluster graph's 2-hop closure stays inside clusters: refining
    // it ALONE cannot cross a cluster boundary, so recall holds but
    // cannot improve past the restriction — the random bridges of
    // knnGraphDescent are what make the local join reach out
    val refinedBaseHits =
      hits(Similarity.knnGraphRefine(vecs, base, k = 3, maxReverse = 3))
    assert(refinedBaseHits >= baseHits)
    val nnd1 = Similarity.knnGraphDescent(vecs, k = 3, rounds = 1,
      nClusters = 4, iterations = 3)
    val nnd1Hits = hits(nnd1)
    assert(nnd1Hits > baseHits,
      s"NN-descent round should improve recall ($baseHits -> $nnd1Hits)")
    // shape: at most k per node, dense ranks
    val rows = nnd1.collect().groupBy(_.getAs[Long]("vec_id"))
    rows.values.foreach { ns =>
      assert(ns.length <= 3)
      assert(ns.map(_.getAs[Int]("rank")).sorted.sameElements(1 to ns.length))
    }
    // further rounds only improve (candidates ⊇ current edges)
    val nnd2Hits = hits(Similarity.knnGraphDescent(vecs, k = 3, rounds = 2,
      nClusters = 4, iterations = 3))
    assert(nnd2Hits >= nnd1Hits)
  }

  test("cosinePairsIncremental: day-2 pairs equal the full run's " +
      "new-touching pairs through a parquet round-trip") {
    def comp(i: Int, d: Int): Float = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$d".getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16).toDouble / (1L << 59) - 1.0).toFloat
    }
    // 30 base vectors + 5 exact copies (ids 30..34 copy 0..4) so true
    // near-dup pairs exist on both sides of the batch split
    val raw = (0 until 30).map(i => (i.toLong, Array.tabulate(8)(comp(i, _)))) ++
      (0 until 5).map(i => ((30 + i).toLong, Array.tabulate(8)(comp(i, _))))
    val vecs = raw.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansFit(vecs, 4, 3)
    val assigned = Similarity.withCluster(vecs, cents)
    val hist = assigned.filter(col("vec_id") % 3 =!= 0)
    val fresh = assigned.filter(col("vec_id") % 3 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("semidx").toString
    hist.write.mode("overwrite").parquet(tmp)
    val incr = Similarity.cosinePairsIncremental(fresh,
        spark.read.parquet(tmp), 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val full = Similarity.cosinePairs(assigned, 0.3, bucketCol = "cluster")
      .as[(Long, Long, Double)].collect().toSet
    val want = full.filter(p => p._1 % 3 == 0 || p._2 % 3 == 0)
    assert(incr == want && incr.nonEmpty)
    // history-history pairs exist in the full run but are not re-mined
    assert(full.exists(p => p._1 % 3 != 0 && p._2 % 3 != 0))
  }
}
