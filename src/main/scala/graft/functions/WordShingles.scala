package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column as one native Catalyst
  * expression.
  *
  * The composed form (`split` then `transform(sequence(...), i ->
  * concat_ws(' ', slice(toks, i+1, n)))`, see
  * [[graft.operators.Dedup.shinglesOf]]) pays an interpreted lambda
  * eval + a slice allocation + a concat per window. This is one loop:
  * split once, then assemble each window with a StringBuilder. Same
  * tokenization (single-space split keeping empty tokens, like
  * `split(text, " ")` with Java semantics `limit = -1`) and the same
  * end-clamping as `slice`, so the output is byte-identical to the
  * composite — every shingle-based oracle holds unchanged.
  *
  * Interpreted eval only ([[CodegenFallback]]), same rationale as
  * [[CosineSimilarity]]: the loop is already tight JVM code and the
  * expression sits between codegen'd stages without breaking them.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"word_shingles expects a string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val count = math.max(toks.length - n + 1, 1)
    val out = new Array[AnyRef](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val end = math.min(i + n, toks.length) // slice clamps at the array end
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}
