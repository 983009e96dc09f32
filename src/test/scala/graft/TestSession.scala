package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks one test JVM). */
object TestSession {
  lazy val spark: SparkSession = Engine.local(4)
  val Sf = "/root/testdata/sf0.001"
}
