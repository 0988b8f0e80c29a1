package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the signed-zero output contract (the q54/q88/q103/q112 class):
  * any value that rounds to zero must emit POSITIVE zero, bit-exactly,
  * and every other value must pass through unchanged. */
class NumSpec extends SparkSpec {
  import spark.implicits._

  private def emit(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).as[Double].head()

  test("round4 collapses a tiny negative to POSITIVE zero (bit-exact)") {
    val v = emit(Num.round4(lit(-1.5e-5)))
    assert(v == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(v) === 0L,
      s"got ${java.lang.Double.toHexString(v)}")
  }

  test("round4 leaves non-zero values, NaN and infinities unchanged") {
    assert(emit(Num.round4(lit(-0.00015))) === -0.0002) // ties away from zero
    assert(emit(Num.round4(lit(1.23456))) === 1.2346)
    assert(emit(Num.round4(lit(Double.NaN))).isNaN)
    assert(emit(Num.round4(lit(Double.PositiveInfinity))).isPosInfinity)
    assert(emit(Num.round4(lit(Double.NegativeInfinity))).isNegInfinity)
  }

  test("roundz honors the requested scale; zcollapse is a no-op off zero") {
    assert(emit(Num.roundz(lit(-1e-9), 2)) === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(
      emit(Num.roundz(lit(-1e-9), 2))) === 0L)
    assert(emit(Num.zcollapse(lit(-7.25))) === -7.25)
    assert(java.lang.Double.doubleToRawLongBits(
      emit(Num.zcollapse(negate(lit(0.0))))) === 0L)
  }
}
