package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating expression (the UDTF leg of the extension
  * surface, next to the scalar codegen Expressions and the typed
  * Aggregators): emits each distinct k-word shingle of a word array as
  * its own output row, straight from the generator — no intermediate
  * array materialization the way `explode(shingles(w, k))` builds the
  * full distinct-shingle array per row before the generate.
  *
  * Works directly on UTF8String slices of the input array; rows stream
  * out of GenerateExec per input row, so peak memory is one row's
  * distinct-shingle set (bounded by document length), not the exploded
  * output.
  */
case class ShingleGenExpr(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def elementSchema: StructType =
    new StructType().add("shingle", StringType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_gen expects array<string>, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < k) Iterator.empty
    else {
      val n = arr.numElements()
      // LinkedHashSet: distinct while keeping first-occurrence order,
      // matching array_distinct(transform(...)) semantics
      val seen = new java.util.LinkedHashSet[UTF8String]
      val sep = UTF8String.fromString(" ")
      var i = 0
      while (i <= n - k) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
      val it = seen.iterator()
      new Iterator[InternalRow] {
        override def hasNext: Boolean = it.hasNext
        override def next(): InternalRow = InternalRow(it.next())
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object ShingleGenExpr {
  /** DataFrame entry: append a `shingle` column with one output row per
    * distinct k-shingle of `wordsCol` (rows with < k words vanish, like
    * a non-outer generate). */
  def apply(df: DataFrame, wordsCol: Column, k: Int): DataFrame =
    bridge.ofRows(df.sparkSession,
      Generate(
        ShingleGenExpr(bridge.expression(df.sparkSession, wordsCol), k),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Nil, child = df.queryExecution.logical))
}
