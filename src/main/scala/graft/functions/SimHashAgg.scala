package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass SimHash aggregator: folds a group's 64-bit word
  * hashes into one 64-lane vote buffer (+1 per set bit, −1 per clear
  * bit) and finishes to the signature (bit i set iff vote ≥ 0) —
  * bit-identical to the 64-conditional-sum DataFrame formulation in
  * [[graft.queries.DedupQueries]], which remains as its cross-check.
  *
  * Why: 64 separate sum-aggregate expressions carry 64 aggregation
  * buffers and 64 shuffle columns per group; this carries ONE 64-long
  * buffer and loops in plain JVM code. Same partial/merge/finish
  * contract at any scale.
  */
object SimHashAgg extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(votes: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < 64) {
      votes(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
      i += 1
    }
    votes
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(votes: Array[Long]): Long = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) >= 0L) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
