package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for exact cosine similarity over two
  * `array<float>` columns — the verification kernel of the embedding
  * near-dup family (Ann.cosineVerified), inside whole-stage codegen.
  *
  * The typed-Dataset form deserialized BOTH float arrays per surviving
  * candidate pair through a DeserializeToObject/Serialize fence (the same
  * disease SigAgreeExpr cured for the minhash estimate tail); this reads
  * the columnar ArrayData in place with zero per-pair allocation.
  *
  * Arithmetic mirrors graft.functions.Sketches.cosine EXACTLY — same
  * accumulation order, same float→double widening (exact), same zero-norm
  * and length-mismatch semantics — so results are bit-identical to the
  * typed form (CosineExprSpec asserts this on adversarial inputs; the
  * q38/q90 oracle hashes pin it end-to-end).
  */
case class CosineExpr(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_fast"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CosineExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

object CosineExpr {
  /** Same arithmetic as Sketches.cosine, over columnar ArrayData. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i); val y = b.getFloat(i)
      dot += x.toDouble * y; na += x.toDouble * x; nb += y.toDouble * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }
}
