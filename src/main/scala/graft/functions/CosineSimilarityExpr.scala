package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two `array<float>` columns.
  *
  * Why a custom Expression (the one place SURVEY §7.3 reserves for it):
  * the built-in composition `aggregate(zip_with(a,b,*),0,+) / (norm·norm)`
  * allocates an intermediate array and evaluates three interpreted
  * higher-order lambdas per row — the single hot path of brute-force ANN
  * (q29: O(Q·N) evaluations). This expression walks both ArrayData
  * buffers once, fusing dot product and both norms, and generates a tight
  * primitive loop under whole-stage codegen via doGenCode.
  *
  * Registered for SQL as `cosine_sim` by [[GraftExtensions]].
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects two array<float> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  // Dimension mismatch is a data bug — failing loudly beats silently
  // truncating to the shorter array and ranking on a wrong similarity
  // (DuckDB's list_dot_product errors the same way, so the oracles agree).
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) CosineSimilarityExpr.dimErrorStatic(n, b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  graft.functions.CosineSimilarityExpr.dimErrorStatic($n, $b.numElements());
         |}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  /** Column-API entry point. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarityExpr(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Called from generated code (codegen can't reference the private
    * instance method). */
  def dimErrorStatic(an: Int, bn: Int): Unit =
    throw new IllegalArgumentException(
      s"cosine_sim: dimension mismatch ($an vs $bn)")
}
