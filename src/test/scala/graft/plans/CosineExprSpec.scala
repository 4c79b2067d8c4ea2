package graft.plans

import graft.SparkSpec
import graft.functions.Sketches
import org.apache.spark.sql.catalyst.util.ArrayData

/** CosineExpr must be BIT-identical to Sketches.cosine (the typed kernel it
  * replaced in Ann.cosineVerified): same accumulation order, same
  * float→double widening, same zero-norm and length-mismatch semantics.
  * java.lang.Double.compare distinguishes -0.0/0.0 and NaN patterns, so the
  * equality below is bitwise, not epsilon.
  */
class CosineExprSpec extends SparkSpec {

  private def viaExpr(a: Array[Float], b: Array[Float]): Double =
    CosineExpr.compute(ArrayData.toArrayData(a), ArrayData.toArrayData(b))

  private def assertSame(a: Array[Float], b: Array[Float]): Unit = {
    val e = viaExpr(a, b)
    val k = Sketches.cosine(a, b)
    assert(java.lang.Double.compare(e, k) == 0, s"expr=$e kernel=$k")
  }

  test("bit-identical to Sketches.cosine on seeded random vectors") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val n = 1 + rng.nextInt(96)
      val a = Array.fill(n)((rng.nextGaussian() * 10).toFloat)
      val b = Array.fill(n)((rng.nextGaussian() * 10).toFloat)
      assertSame(a, b)
      assertSame(a, a) // self-cosine exercises the dot==na==nb path
    }
  }

  test("edge cases: zero vectors, empty, mismatched lengths, extremes") {
    assertSame(Array(0f, 0f, 0f), Array(1f, 2f, 3f))          // zero norm -> 0.0
    assertSame(Array(1f, 2f), Array(0f, 0f))                  // other side zero
    assertSame(Array.emptyFloatArray, Array.emptyFloatArray)  // empty -> 0.0
    assertSame(Array(1f, 2f, 3f, 4f), Array(1f, 2f))          // min-length loop
    assertSame(Array(1f, 2f), Array(1f, 2f, 3f, 4f))
    assertSame(Array(Float.MaxValue, Float.MinPositiveValue),
               Array(Float.MinPositiveValue, Float.MaxValue))
    assertSame(Array(-1f, -2f, -3f), Array(1f, 2f, 3f))       // exact -1.0 direction
  }

  test("cosine_fast is registered by GraftExtensions for plain SQL") {
    val v = spark.sql(
      """SELECT cosine_fast(cast(array(1.0, 0.0) as array<float>),
        |                   cast(array(0.0, 1.0) as array<float>)) AS c""".stripMargin)
      .head().getDouble(0)
    assert(v == 0.0)
    val same = spark.sql(
      """SELECT cosine_fast(cast(array(3.0, 4.0) as array<float>),
        |                   cast(array(3.0, 4.0) as array<float>)) AS c""".stripMargin)
      .head().getDouble(0)
    assert(same == 1.0)
  }
}
