package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment as ONE codegen'd expression:
  * argmin_j (‖c_j‖² − 2·x·c_j), ties to the lowest j — numerically
  * identical to the `least(struct(dist, j)…)` composition it replaces
  * (same ‖c_j‖² driver-side sum, same index-order dot product, same
  * IEEE subtract/multiply), but with two decisive advantages for the
  * iterative fitters that call it once per Lloyd iteration:
  *
  *  - The centroid matrix lives in the expression as a REFERENCE OBJECT
  *    (`ctx.addReferenceObj`), not as k×d literal leaves. Generated
  *    source is therefore byte-identical across iterations — janino's
  *    compiled-class cache hits instead of recompiling a thousand-line
  *    stage per iteration, which at toy scale dominated the entire
  *    k-means fit (~3 s of compilation per iteration for 64-dim
  *    centroids; the arithmetic itself is microseconds).
  *  - One fused k×d loop instead of k separate dot-product expressions
  *    plus a k-way `least` tree — smaller code, one array-null check,
  *    better locality.
  *
  * Used by every quantizer in [[graft.scale.Similarity]] (k-means fit /
  * assign, IVF routing, PQ per-subspace codebooks).
  */
case class VecNearestCluster(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_nearest_cluster needs array<float|double>, got $other")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_nearest_cluster"

  // ‖c_j‖² precomputed once, in the same left-to-right summation order
  // the literal-based composition used
  @transient private lazy val csq: Array[Double] = cents.map(_.map(x => x * x).sum)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    var best = Double.PositiveInfinity
    var bestJ = 0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(a.numElements(), c.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += (if (isF) a.getFloat(i).toDouble else a.getDouble(i)) * c(i)
        i += 1
      }
      val d = csq(j) - 2.0 * dot
      if (d < best) { best = d; bestJ = j }
      j += 1
    }
    bestJ
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val csqRef = ctx.addReferenceObj("csq", csq, "double[]")
    // freshName every local — see VecCosine.doGenCode
    val cs = ctx.freshName("cs")
    val sq = ctx.freshName("sq")
    val best = ctx.freshName("best")
    val bestJ = ctx.freshName("bestJ")
    val j = ctx.freshName("j")
    val c = ctx.freshName("c")
    val n = ctx.freshName("n")
    val dot = ctx.freshName("dot")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |double[][] $cs = $centsRef;
         |double[] $sq = $csqRef;
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestJ = 0;
         |for (int $j = 0; $j < $cs.length; $j++) {
         |  double[] $c = $cs[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $c.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.$get($i) * $c[$i];
         |  }
         |  double $d = $sq[$j] - 2.0 * $dot;
         |  if ($d < $best) { $best = $d; $bestJ = $j; }
         |}
         |${ev.value} = $bestJ;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : VecNearestCluster = copy(child = newChild)
}
