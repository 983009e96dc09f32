package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating expression for CHARACTER-window rolling
  * hashes — the candidate phase of exact substring dedup (Lee et al.
  * "Deduplicating Training Data Makes Language Models Better"): every
  * L-codepoint window of the text at stride `s` emits one
  * `(pos, h)` row, where `pos` is the 1-based CODEPOINT offset
  * (aligning with SQL `substring`) and `h` a 64-bit wrap-around
  * polynomial hash maintained by an O(1)-per-character ROLL — the
  * whole document costs O(chars), not O(chars × L) the way
  * `substring(text, i, L)` per window would.
  *
  * The hash is a CANDIDATE key only: collisions are harmless because
  * the dedup query re-extracts the actual substring for colliding
  * positions and confirms on content — so the 100 TB shuffle is keyed
  * by 8-byte hashes while correctness stays byte-exact.
  */
case class WindowHashGenExpr(child: Expression, len: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(len >= 2 && stride >= 1,
    s"window len >= 2 and stride >= 1 required, got ($len, $stride)")

  private final val B = 1000003L // wrap-around polynomial base

  override def elementSchema: StructType =
    new StructType()
      .add("pos", IntegerType, nullable = false)
      .add("h", LongType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_hashes expects string, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input).asInstanceOf[UTF8String]
    if (text == null) Iterator.empty
    else {
      val cps = text.toString.codePoints().toArray
      val n = cps.length
      if (n < len) Iterator.empty
      else {
        // pow = B^(len-1), wrapping; h0 over the first window
        var pow = 1L
        var j = 1
        while (j < len) { pow *= B; j += 1 }
        var h = 0L
        j = 0
        while (j < len) { h = h * B + cps(j); j += 1 }
        // roll once per character, emit at stride positions; peak
        // memory is one document's window rows (n/stride), the same
        // bound ShingleGenExpr's distinct set carries
        val out = new scala.collection.mutable.ArrayBuffer[InternalRow](
          n / stride + 1)
        var i = 0 // 0-based window start (codepoints)
        while (i <= n - len) {
          if (i % stride == 0) out += InternalRow(i + 1, h)
          if (i < n - len) h = (h - cps(i) * pow) * B + cps(i + len)
          i += 1
        }
        out.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object WindowHashGenExpr {
  /** DataFrame entry: append `(pos, h)` columns with one output row
    * per stride-aligned L-codepoint window of `textCol` (rows shorter
    * than L codepoints vanish, like a non-outer generate). */
  def apply(df: DataFrame, textCol: Column, len: Int, stride: Int)
      : DataFrame =
    bridge.ofRows(df.sparkSession,
      Generate(
        WindowHashGenExpr(bridge.expression(df.sparkSession, textCol),
          len, stride),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Nil, child = df.queryExecution.logical))
}
