package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling-hash document
  * fingerprint: `hash = fold(bytes, init, (a, b) -> (a*31 + b) mod 1e9+7)`.
  *
  * Semantically identical (for ASCII text) to the built-in composition
  * in [[TextFunctions.fingerprint]] — `aggregate(split(text,''), ...)` —
  * but runs as a single tight loop over the UTF8 bytes with full
  * whole-stage codegen: no per-character array materialization, no
  * higher-order-function lambda dispatch. This is the preference-order
  * step (b) "custom codegen Expression" from SURVEY.md §2b, applied
  * where profiling justifies it (fingerprinting every document of a
  * 100 TB corpus is scan-bound; the split() formulation allocates a
  * ~2× text-size array per row).
  */
case class RollingHash(child: Expression, init: Long = 7L,
    modulus: Long = 1000000007L)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName needs a string input")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = init
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xFF)) % modulus
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        byte[] $bytes = $c.getBytes();
        long $acc = ${init}L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $acc = ($acc * 31L + ($bytes[$i] & 0xFF)) % ${modulus}L;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object RollingHash {
  /** Register `graft_rolling_hash(text)` on the session's function
    * registry; use via `expr("graft_rolling_hash(text)")` or SQL.
    * (Spark 4's Column API is Catalyst-independent, so registry
    * registration is the public route from a custom Expression to a
    * Column.) */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Registration.once(spark, "graft_rolling_hash")(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry.createOrReplaceTempFunction(
          "graft_rolling_hash", exprs => RollingHash(exprs.head), "built-in"))
}
