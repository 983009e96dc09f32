package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed single-pass centroid aggregator over `array<float>` embeddings
  * — the 100 TB path for [[graft.queries.VectorQueries.centroids]]: one
  * partial buffer (sum vector + count) per partition per group instead
  * of a 64× posexplode row blow-up; the shuffle carries dim+1 doubles
  * per group per partition.
  *
  * Register with `udaf(VectorMeanAgg)` or use via `Dataset.agg`.
  */
object VectorMeanAgg
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float])
      : (Array[Double], Long) = {
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long))
      : (Array[Double], Long) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0L) Seq.empty
    else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
