package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF surface (SURVEY §2.7: the reference has no user-facing UDAF —
  * its aggregate functions are a fixed enum — so this is the beyond-parity
  * extension point Spark's `Aggregator[IN, BUF, OUT]` provides).
  *
  * CentroidAgg computes element-wise embedding centroids (the k-means
  * update step / class-prototype computation) in ONE pass over the vectors.
  * The naive formulation — posexplode to (row, dim, value) then
  * groupBy(dim) — multiplies the shuffled row count by the dimensionality
  * (×64 here, ×4096 for production embeddings): at 100 TB that explosion IS
  * the job. The Aggregator instead carries one Array[Long] buffer per group
  * per partition, so only |groups|·|partitions| buffers ever shuffle.
  *
  * Determinism contract (same discipline as [[graft.util.Det]]): each float
  * component is scaled to an integer microunit long with floor(x·10⁶ + 0.5)
  * — the identical closed form the DuckDB oracle applies — summed exactly in
  * long space (|component| ≲ 1 keeps 10¹² rows per group inside 2⁶³), and
  * divided once at finish. Buffer slot dims holds the grand total so the
  * all-components mean is also a single exact-sum division rather than an
  * order-sensitive double fold.
  */
class CentroidAgg(dims: Int)
    extends Aggregator[Array[Float], CentroidAgg.Buf, Array[Double]] {
  import CentroidAgg.Buf

  override def zero: Buf = Buf(0L, new Array[Long](dims + 1))

  private def scaled(x: Float): Long =
    math.floor(x.toDouble * 1e6 + 0.5).toLong

  override def reduce(b: Buf, v: Array[Float]): Buf = {
    require(v.length == dims, s"expected $dims-dim vector, got ${v.length}")
    var i = 0
    var tot = 0L
    while (i < dims) {
      val s = scaled(v(i))
      b.sums(i) += s
      tot += s
      i += 1
    }
    b.sums(dims) += tot
    b.n += 1
    b
  }

  override def merge(x: Buf, y: Buf): Buf = {
    var i = 0
    while (i <= dims) { x.sums(i) += y.sums(i); i += 1 }
    x.n += y.n
    x
  }

  /** dims component means followed by the grand (all-components) mean. */
  override def finish(b: Buf): Array[Double] = {
    val out = new Array[Double](dims + 1)
    var i = 0
    while (i < dims) {
      out(i) = b.sums(i).toDouble / (b.n * 1e6)
      i += 1
    }
    out(dims) = b.sums(dims).toDouble / (b.n.toDouble * dims * 1e6)
    out
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object CentroidAgg {
  case class Buf(var n: Long, sums: Array[Long])
}
