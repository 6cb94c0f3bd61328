package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Raw repetition counters of a text column in ONE tokenization pass:
  * `struct(n_toks, n_distinct, top_bigram, max_run)` — the integer
  * inputs of the three Gopher-style repetition signals
  * ([[graft.operators.TextAnalysis.repetitionSignals]]).
  *
  *   - `n_toks` / `n_distinct`: `size(toks)` / `size(array_distinct(toks))`
  *     for `toks = split(text, ' ')` (Java `limit = -1` semantics —
  *     empty tokens kept, exactly Spark's `split`).
  *   - `top_bigram`: the modal 2-gram's multiplicity over the same
  *     end-clamped bigram windows as the composed
  *     `transform(sequence(1, greatest(n-1, 1)), i -> concat_ws(' ',
  *     slice(toks, i, 2)))` (a 1-token doc contributes its lone token).
  *   - `max_run`: longest positional run of consecutive equal tokens.
  *
  * The composed form pays `sort_array` (O(n log n)) plus three
  * interpreted `aggregate` lambdas allocating a struct per element;
  * this is one hash-map pass. The signal DERIVATION (divisions,
  * `round(_, 6)`) stays in Catalyst column math on these counters, so
  * the operator's output is value-identical by construction
  * (spec-pinned in CurationSpec).
  *
  * Interpreted eval only ([[CodegenFallback]]), same rationale as
  * [[WordShingles]].
  */
case class RepetitionStats(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_toks", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false),
    StructField("max_run", IntegerType, nullable = false)
  ))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"repetition_stats expects a string, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.toString.split(" ", -1)
    val n = toks.length // >= 1: split("") is Array("")

    val distinct = new java.util.HashSet[String]()
    var maxRun = 1
    var run = 1
    var i = 0
    while (i < n) {
      distinct.add(toks(i))
      if (i > 0) {
        if (toks(i) == toks(i - 1)) { run += 1; if (run > maxRun) maxRun = run }
        else run = 1
      }
      i += 1
    }

    // bigram windows mirror the composed slice: indices 0..max(n-2, 0),
    // the last (or only) window clamped at the array end
    val bigramCounts = new java.util.HashMap[String, Int]()
    var topBigram = 0
    val windows = math.max(n - 1, 1)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < windows) {
      sb.setLength(0)
      sb.append(toks(i))
      if (i + 1 < n) { sb.append(' '); sb.append(toks(i + 1)) }
      val key = sb.toString
      val c = bigramCounts.merge(key, 1, Integer.sum)
      if (c > topBigram) topBigram = c
      i += 1
    }

    val row = new GenericInternalRow(4)
    row.setInt(0, n)
    row.setInt(1, distinct.size())
    row.setInt(2, topBigram)
    row.setInt(3, maxRun)
    row: InternalRow
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}
