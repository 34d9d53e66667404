package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed dense linear algebra over an embedding column — the
  * pieces of PCA/whitening that must run where the data is: the d×d
  * scatter (Gram) matrix X<sup>T</sup>X. At 64–1024 dims the matrix is
  * tiny but the row count is the corpus — so the right plan is
  * per-partition accumulation into a d(d+1)/2 upper-triangle array
  * (one pass, sequential cache-friendly multiply-adds), then a shuffle
  * of only #partitions × d(d+1)/2 partial rows to a final sum. The
  * naive relational form (posexplode × self-join on row id) shuffles
  * |rows|·d² — a million times more at corpus scale.
  *
  * Values are micro-scaled integers (⌊x·10⁶⌋): products and sums stay
  * exact BIGINTs, so the result is reduction-order-free and
  * cross-engine reproducible bit-for-bit (a double Σ over 10⁸ rows is
  * neither). Headroom: |x|≤1 ⇒ |xᵢxⱼ|≤10¹², safe to ~9·10⁶ rows per
  * BIGINT; rescale the unit for larger corpora.
  */
object LinAlg {

  /** Upper-triangle scatter matrix of ⌊x·10⁶⌋ integer vectors.
    * @return (i, j, s) with 1-based dims, i ≤ j,
    *         s = Σ_rows ⌊xᵢ·10⁶⌋·⌊xⱼ·10⁶⌋ */
  def gramMicro(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val partials: Dataset[(Int, Int, Long)] =
      df.select(col(vecCol)).as[Seq[Float]].mapPartitions { it =>
        var acc: Array[Long] = null
        var dim = 0
        var xi: Array[Long] = null
        it.foreach { v =>
          if (acc == null) {
            dim = v.length
            acc = new Array[Long](dim * (dim + 1) / 2)
            xi = new Array[Long](dim)
          }
          // ragged inputs must fail loudly: a longer vector would be
          // silently truncated to the partition's first-row dim (and a
          // shorter one would throw an opaque index error), corrupting
          // the Gram/covariance with mixed statistics
          if (v.length != dim)
            throw new IllegalArgumentException(
              s"gramMicro: inconsistent embedding dims ${v.length} vs $dim")
          var i = 0
          while (i < dim) {
            xi(i) = math.floor(v(i).toDouble * 1000000d).toLong; i += 1
          }
          var k = 0
          i = 0
          while (i < dim) {
            val a = xi(i)
            var j = i
            while (j < dim) { acc(k) += a * xi(j); j += 1; k += 1 }
            i += 1
          }
        }
        if (acc == null) Iterator.empty
        else {
          val out = new Array[(Int, Int, Long)](acc.length)
          var k = 0; var i = 0
          while (i < dim) {
            var j = i
            while (j < dim) { out(k) = (i + 1, j + 1, acc(k)); j += 1; k += 1 }
            i += 1
          }
          out.iterator
        }
      }
    partials.toDF("i", "j", "s").groupBy("i", "j").agg(sum("s").as("s"))
  }

  /** Per-dimension micro-unit sums — the other sufficient statistic
    * (besides [[gramMicro]]) PCA needs for mean-centering. One narrow
    * aggregation: posexplode + (dim → sum), exact BIGINTs. */
  def dimSumsMicro(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .select((col("__i") + 1).as("i"),
        floor(col("__x").cast("double") * 1000000d).cast("long").as("v"))
      .groupBy("i").agg(sum(col("v")).as("s"), count(lit(1)).as("n"))

  /** Centered covariance NUMERATOR in exact integers: for i ≤ j,
    * cov_num = n·S_ij − s_i·s_j over the micro-scaled values (the
    * population covariance is cov_num / n² / 10¹²). Composes the two
    * distributed statistics with two broadcast joins against the tiny
    * (d-sized) sums table — corpus touched exactly twice, result
    * reduction-order-free and engine-exact.
    *
    * Integer headroom: |cov_num| ≤ n²·(u·max|x|)² with u = 10⁶, so the
    * BIGINT bound holds while n·u·max|x| < 3.0·10⁹ — e.g. 5·10³ rows of
    * unit-norm values at micro units, 5·10⁶ rows at milli units. For a
    * corpus past that, rescale to a coarser unit (the tradeoff is
    * quantization of the statistic, not overflow). */
  def covNumMicro(df: DataFrame, vecCol: String): DataFrame = {
    val gram = gramMicro(df, vecCol)
    val sums = dimSumsMicro(df, vecCol)
    val si = broadcast(sums.select(col("i"), col("s").as("__si"),
      col("n").as("__n")))
    val sj = broadcast(sums.select(col("i").as("j"), col("s").as("__sj")))
    gram.join(si, "i").join(sj, "j")
      .select(col("i"), col("j"),
        (col("__n") * col("s") - col("__si") * col("__sj")).as("cov_num"))
  }

  /** Covariance matrix (double, original units) assembled driver-side
    * from the exact integer statistics: C = S/n − μμᵀ with S the micro
    * scatter and μ the micro means, rescaled by 10⁻¹². d×d doubles —
    * tiny; the corpus-sized work stayed in the two aggregations. */
  def covarianceFromStats(gram: Seq[(Int, Int, Long)],
                          sums: Seq[(Int, Long)], n: Long): Array[Array[Double]] = {
    val d = sums.map(_._1).max
    val mu = new Array[Double](d)
    sums.foreach { case (i, s) => mu(i - 1) = s.toDouble / n / 1e6 }
    val c = Array.ofDim[Double](d, d)
    gram.foreach { case (i, j, s) =>
      val v = s.toDouble / n / 1e12 - mu(i - 1) * mu(j - 1)
      c(i - 1)(j - 1) = v; c(j - 1)(i - 1) = v
    }
    c
  }

  /** Top-r eigenpairs of a small symmetric PSD matrix by deterministic
    * power iteration with deflation — fixed start (e₁-biased ramp),
    * fixed iteration count, no RNG, so results are reproducible across
    * runs and engines. Driver-side: the matrix is d×d (the corpus never
    * touches this). @return (eigenvalues desc, row-major eigenvectors) */
  def topEigen(m: Array[Array[Double]], r: Int,
               iters: Int = 200): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val vals = new Array[Double](r)
    val vecs = Array.ofDim[Double](r, d)
    for (c <- 0 until r) {
      var v = Array.tabulate(d)(i => 1.0 + 1.0 / (i + 1))
      var it = 0
      while (it < iters) {
        val w = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0; var j = 0
          while (j < d) { s += a(i)(j) * v(j); j += 1 }
          w(i) = s; i += 1
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        v = if (nrm > 0) w.map(_ / nrm) else w
        it += 1
      }
      var lam = 0.0
      for (i <- 0 until d; j <- 0 until d) lam += v(i) * a(i)(j) * v(j)
      vals(c) = lam; vecs(c) = v
      // deflate: a ← a − λ v vᵀ
      for (i <- 0 until d; j <- 0 until d) a(i)(j) -= lam * v(i) * v(j)
    }
    (vals, vecs)
  }

  /** Project (mean-centered) vectors onto broadcast components — the
    * distributed half of PCA/whitening: one narrow map, no shuffle;
    * components and mean ride the closure (r·d + d doubles). */
  def project(df: DataFrame, vecCol: String, idCol: String,
              mean: Array[Double], components: Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val r = components.length
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val y = new Array[Double](r)
          var c = 0
          while (c < r) {
            var s = 0.0; var i = 0
            val comp = components(c)
            while (i < v.length) { s += comp(i) * (v(i) - mean(i)); i += 1 }
            y(c) = s; c += 1
          }
          (id, y.toSeq)
        }
      }.toDF(idCol, "proj")
  }
}
