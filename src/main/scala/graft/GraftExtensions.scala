package graft

import graft.functions.{CosineSimilarityExpr, NfcNormalizeExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers the engine's native functions for SQL
  * use. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim expects exactly 2 arguments")
        CosineSimilarityExpr(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfc_normalize expects exactly 1 argument")
        NfcNormalizeExpr(children.head)
      }))
  }
}
