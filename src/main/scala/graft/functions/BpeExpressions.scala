package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The BPE merge-table replay (char-split a word, then apply every
  * trained (a, b) merge in round order, leftmost non-overlapping) as
  * ONE native Catalyst Expression.
  *
  * Replaces a `rounds`-deep chain of `aggregate()` higher-order folds:
  * semantics are identical (a single left-to-right pass per round — a
  * pair merged at (i, i+1) cannot re-merge as the left operand of the
  * same round, exactly the trainer's accumulator fold in
  * [[graft.operators.TextStats]]), but the expression TREE is one node
  * instead of ~20 nested lambdas. The deep chain cost ~3-4 s of
  * SF-INDEPENDENT analysis + codegen per query (the round-12
  * text_bpe_encode_oov bench floor — measured: the same plan over 31
  * distinct words and over 39k tokens both paid it); one node costs
  * nothing to analyze and evaluates as a tight imperative loop.
  *
  * The merge table rides as a FOLDABLE array<array<string>> literal
  * (≤ 20 pairs by the trainer's cap — a bounded driver artifact, the
  * codebook discipline), evaluated once at plan time.
  */
case class BpeApplyMergesExpr(word: Expression, merges: Expression)
    extends BinaryExpression {

  override def left: Expression = word
  override def right: Expression = merges

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (word.dataType, merges.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _))
          if merges.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, foldable array<array<string>>), " +
          s"got ${word.dataType.catalogString} / " +
          s"${merges.dataType.catalogString}")
    }

  /** The merge table, materialized once from the foldable literal. */
  @transient private lazy val mergePairs: Array[Array[String]] = {
    val ad = merges.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements()) { i =>
      val p = ad.getArray(i)
      Array(p.getUTF8String(0).toString, p.getUTF8String(1).toString)
    }
  }

  override def nullSafeEval(w: Any, m: Any): Any =
    BpeApply.apply(w.asInstanceOf[UTF8String], mergePairs)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergePairs,
      "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.BpeApply.apply($w, $ref);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(word = newLeft, merges = newRight)
}

/** The imperative replay shared by interpreted eval and codegen (the
  * static forwarder makes `graft.functions.BpeApply.apply(...)`
  * callable from generated Java). */
object BpeApply {
  def apply(word: UTF8String, merges: Array[Array[String]]): UTF8String = {
    val s = word.toString
    // char-split exactly like split(word, '') — per Java char
    var syms = new Array[String](s.length)
    var c = 0
    while (c < s.length) { syms(c) = String.valueOf(s.charAt(c)); c += 1 }
    var mi = 0
    while (mi < merges.length) {
      val a = merges(mi)(0)
      val b = merges(mi)(1)
      val out = new java.util.ArrayList[String](syms.length)
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out.add(a + b); i += 2
        } else { out.add(syms(i)); i += 1 }
      }
      syms = out.toArray(new Array[String](out.size()))
      mi += 1
    }
    UTF8String.fromString(String.join(" ", syms: _*))
  }
}

object BpeExpressions {
  val ApplyName = "graft_bpe_apply"

  /** Register in the session's function registry (the public route
    * from Expression to Column in Spark 4). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ApplyName, exprs => BpeApplyMergesExpr(exprs(0), exprs(1)),
      "built-in")

  /** Column-API merge replay; requires [[register]] on the session. */
  def bpeApply(word: Column, merges: Column): Column =
    call_function(ApplyName, word, merges)
}
