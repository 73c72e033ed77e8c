package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise centroid (mean vector) of an
  * `array<float>` embedding column.
  *
  * The buffer carries (element sums in double, row count); merge is
  * associative/commutative so Catalyst runs it partial+final (map-side
  * combine first — at 100 TB only `dim`-sized buffers cross the shuffle,
  * never raw vectors).
  */
object CentroidAggregator extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) return b
    val sums = if (b._1.length >= v.length) b._1 else java.util.Arrays.copyOf(b._1, v.length)
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (small, big) = if (a._1.length <= b._1.length) (a._1, b._1) else (b._1, a._1)
    val sums = big.clone()
    var i = 0
    while (i < small.length) { sums(i) += small(i); i += 1 }
    (sums, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
