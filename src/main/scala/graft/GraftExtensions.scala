package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.VecDotF

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions so plain-SQL users get them without touching the Scala
  * API. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(
        functions.VecExpressions.DotName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VecDotF].getName, functions.VecExpressions.DotName),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDotF(exprs(0), exprs(1))))
  }
}
