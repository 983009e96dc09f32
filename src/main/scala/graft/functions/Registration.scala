package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Idempotent function registration: declared queries register their
  * custom functions on every invocation (each query must be
  * self-contained), but re-registering an existing temp function makes
  * SimpleFunctionRegistry WARN on every call — noise that eats into the
  * harness's bounded output tail. Check-then-register once per session. */
object Registration {
  def once(spark: SparkSession, name: String)(register: => Unit): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name))) register
  }
}
