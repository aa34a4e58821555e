package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Float-vector kernel for the embedding operators. Accumulation is a
 * sequential double fold in index order — the exact evaluation order an
 * external SQL oracle mirrors with `list_sum([CAST(a[i] AS DOUBLE)*b[i] ...])`,
 * so scores are bit-identical while avoiding the per-row array allocation of
 * the equivalent `aggregate(zip_with(...))` built-in formulation (~10×
 * faster inside an O(n²) pair join).
 */
object VecOps {

  /** Sequential-order double dot product of two float vectors. Dimension
    * mismatch is a data bug — fail loudly rather than silently truncating
    * to the shorter vector (a deflated score would corrupt every
    * similarity ranking downstream without ever surfacing). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** sqrt of the self dot product — same fold order as [[dotF]]. */
  def normF(a: ArrayData): Double = math.sqrt(dotF(a, a))

  /** Squared euclidean distance, per-element (a−b)² in double, summed in
    * index order — the SQL oracle mirrors with
    * `list_sum([(CAST(a[i] AS DOUBLE)-CAST(b[i] AS DOUBLE))*(...) ...])`
    * for bit-identical values. Same loud dimension-mismatch contract as
    * [[dotF]]. */
  def dist2F(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dist2: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }
}

/** vec_dot(a float[], b float[]) → double. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** vec_dist2(a float[], b float[]) → double squared euclidean distance. */
case class VecDist2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dist2F(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dist2F($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDist2 =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dist2"
}

/** vec_norm(a float[]) → double. */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = VecOps.normF(a.asInstanceOf[ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecOps.normF($a)")
  override protected def withNewChildInternal(c: Expression): VecNorm = copy(child = c)
  override def prettyName: String = "vec_norm"
}
