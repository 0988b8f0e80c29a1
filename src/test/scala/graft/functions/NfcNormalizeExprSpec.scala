package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** Native NFC normalization (q151): codegen ≡ interpreted ≡ the JDK
  * Normalizer ground truth, the singleton and combining-mark cases,
  * identity on already-NFC input, the dedup-identity composition it
  * exists for, and SQL registration. */
class NfcNormalizeExprSpec extends SparkSpec {
  import NfcNormalizeExpr.nfcNormalize
  import spark.implicits._

  private val decomposed = "cafe\u0301 nai\u0308ve \u212B"
  private val precomposed = "caf\u00E9 na\u00EFve \u00C5"

  test("codegen path: combining marks compose, the U+212B singleton maps to U+00C5") {
    val out = Seq(Tuple1(decomposed)).toDF("s")
      .select(nfcNormalize(col("s"))).as[String].collect().head
    assert(out === precomposed)
    assert(out === java.text.Normalizer.normalize(
      decomposed, java.text.Normalizer.Form.NFC))
  }

  test("interpreted eval agrees; already-NFC input is identity; null and empty pass through") {
    val e = NfcNormalizeExpr(Literal.create(decomposed))
    assert(e.eval(null).asInstanceOf[UTF8String].toString === precomposed)
    assert(NfcNormalizeExpr(Literal.create(precomposed)).eval(null)
      .asInstanceOf[UTF8String].toString === precomposed)
    assert(NfcNormalizeExpr(Literal.create("plain ascii")).eval(null)
      .asInstanceOf[UTF8String].toString === "plain ascii")
    assert(NfcNormalizeExpr(Literal.create(null, org.apache.spark.sql.types.StringType))
      .eval(null) === null)
    assert(NfcNormalizeExpr(Literal.create("")).eval(null)
      .asInstanceOf[UTF8String].toString === "")
  }

  test("the reason it exists: NFD and NFC variants of the same text hash identically after normalization") {
    val df = Seq((1L, decomposed), (2L, precomposed)).toDF("id", "s")
    val raw = df.select(md5(col("s"))).as[String].collect().toSet
    assert(raw.size === 2, "byte-distinct before normalization")
    val norm = df.select(md5(nfcNormalize(col("s")))).as[String].collect().toSet
    assert(norm.size === 1, "one content identity after normalization")
  }

  test("SQL registration: nfc_normalize callable from spark.sql") {
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NfcNormalizeExpr(children.head))
    Seq(Tuple1(decomposed)).toDF("s").createOrReplaceTempView("nfc_in")
    val out = spark.sql("SELECT nfc_normalize(s) FROM nfc_in")
      .collect().head.getString(0)
    assert(out === precomposed)
  }
}
