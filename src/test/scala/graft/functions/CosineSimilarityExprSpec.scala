package graft.functions

import graft.SparkSpec
import graft.functions.CosineSimilarityExpr.cosineSim
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.functions._

class CosineSimilarityExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
    (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))
  ).toDF("a", "b")

  test("native expression matches the builtin zip_with/aggregate composition") {
    val both = vecs.select(
      cosineSim(col("a"), col("b")).as("native"),
      VectorFunctions.cosine(col("a"), col("b")).as("composed"))
      .collect()
    both.foreach { r =>
      (Option(r.get(0)), Option(r.get(1))) match {
        case (Some(n: Double), Some(c: Double)) => assert(math.abs(n - c) < 1e-12)
        case (None, c) =>
          // zero vector: both variants yield null
          assert(c.isEmpty)
        case other => fail(s"unexpected $other")
      }
    }
  }

  test("interpreted eval (nullSafeEval) agrees with codegen path") {
    // force interpreted evaluation by collecting through an eval'd filter
    val expr = CosineSimilarityExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0f, 4.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    val v = expr.eval(null).asInstanceOf[Double]
    assert(math.abs(v - 1.0) < 1e-12)
  }

  test("dimension mismatch raises on both codegen and interpreted paths") {
    import graft.functions.CosineSimilarityExpr.cosineSim
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    // local mode may surface the IllegalArgumentException directly or
    // wrapped in a SparkException — accept either, require the message
    val e = intercept[Exception] {
      df.select(cosineSim(col("a"), col("b"))).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("dimension mismatch")), msgs.mkString(" | "))
  }

  test("SQL registration: cosine_sim callable from spark.sql") {
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarityExpr(children.head, children(1)))
    val v = spark.sql(
      "SELECT cosine_sim(array(cast(1.0 AS FLOAT), cast(0.0 AS FLOAT)), " +
        "array(cast(1.0 AS FLOAT), cast(0.0 AS FLOAT))) AS c")
      .as[Double].head()
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
