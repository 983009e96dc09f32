package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass MinHash aggregator: folds a group's base shingle
  * hashes into NUM_HASHES per-permutation minima in one Array[Long]
  * buffer. The permutation family is derived from ONE base xxhash64
  * per shingle via the splitmix64 finalizer over `base ^ seed_i`
  * (a standard universal-hash construction) — versus computing
  * NUM_HASHES independent full string hashes per shingle and carrying
  * NUM_HASHES separate min-aggregate columns through the shuffle.
  *
  * With the portable md5-derived base hash
  * ([[graft.functions.TextFunctions.hash64]]) the whole signature map
  * is engine-independent: the DuckDB oracle replays splitmix64 over
  * UBIGINT (DedupQueries.minhashOracleSql) and hash-gates the
  * declared `dedup_minhash` query end to end; the LSH recall bound
  * against exact Jaccard in DedupSimSpec remains the
  * hash-family-agnostic contract.
  */
object MinHashAgg extends Aggregator[Long, Array[Long], Seq[Long]] {

  val NumHashes = 32

  private val seeds: Array[Long] =
    Array.tabulate(NumHashes)(i => 0x9E3779B97F4A7C15L * (i + 1))

  /** splitmix64 finalizer — full 64-bit avalanche. */
  @inline private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  override def reduce(mins: Array[Long], base: Long): Array[Long] = {
    var i = 0
    while (i < NumHashes) {
      val h = mix(base ^ seeds(i))
      if (h < mins(i)) mins(i) = h
      i += 1
    }
    mins
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(mins: Array[Long]): Seq[Long] = mins.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
