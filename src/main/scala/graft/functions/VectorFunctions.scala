package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd collection expressions (`zip_with` / `aggregate` /
  * `transform`) — no UDFs, so the whole dot product stays inside
  * whole-stage codegen.
  *
  * Precision contract: every element is cast to double BEFORE any
  * multiply, and folds run left-to-right (Spark's `aggregate` is a
  * sequential fold), matching an oracle that sums `CAST(x AS DOUBLE) *
  * CAST(y AS DOUBLE)` in array order.
  */
object VectorFunctions {

  /** Dot product in double precision. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm in double precision. */
  def normSqD(a: Column): Column =
    aggregate(
      transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / sqrt(normSqD(a) * normSqD(b))

  /** Random-hyperplane LSH bucket id: bit i of the result is the sign of
    * dot(v, planes(i)). Planes are plan constants (broadcast literals) —
    * at 100 TB the bucketing is a narrow map, no shuffle, no driver
    * state; the subsequent per-bucket search shuffles once on bucket id. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dotD(v, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic pseudo-random unit-free hyperplanes (fixed seed — part
    * of the operator definition, not runtime randomness). */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }
}
