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
}
