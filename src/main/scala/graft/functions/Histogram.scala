package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Equi-width histogram sketch as a typed [[Aggregator]] — the
  * quantile-estimation member of the sketch family ([[HllSketch]]:
  * distinct counts, [[CmsSketch]]: frequencies, this: percentiles).
  * Fixed bins over a known value domain give O(bins) state per group
  * regardless of row count; merge is elementwise sum (associative +
  * commutative → partition-order independent, streaming-window ready).
  * The percentile estimate is rank-based and integer-only: the lower
  * bound of the first bin whose cumulative count reaches ceil(q·n) —
  * a one-sided bound within one bin width of the exact percentile,
  * which is the trade every fixed-memory quantile sketch makes
  * (t-digest/KLL tighten the bound adaptively; the equi-width form is
  * the one a SQL engine can replay bit-exactly, see SketchOps a26).
  */
object HistogramSketch {
  val numBins = 60
  val binWidth = 10000.0

  /** Bin of a value: floor(v / width), clamped to BOTH ends (values
    * below the domain land in bin 0, above in the last bin — a sketch
    * must never crash on out-of-domain input) — the exact twin of SQL
    * `least(greatest(floor(v / 10000.0), 0), 59)` (same IEEE division
    * in both engines). */
  def bin(v: Double): Int =
    math.min(math.max(math.floor(v / binWidth).toInt, 0), numBins - 1)

  /** Rank-based percentile from bin counts: lower bound of the first
    * bin whose cumulative count reaches ceil(q·n), as integer
    * arithmetic (cum·den ≥ num·n ⟺ cum ≥ ceil(q·n) for q = num/den). */
  def percentileLo(counts: Array[Long], num: Long, den: Long): Long = {
    val n = counts.sum
    var cum = 0L
    var i = 0
    while (i < counts.length) {
      cum += counts(i)
      if (cum * den >= num * n) return i * binWidth.toLong
      i += 1
    }
    (counts.length - 1) * binWidth.toLong
  }

  def unpack(packed: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(packed)
    Array.fill(numBins)(bb.getLong())
  }
}

/** IN = value, BUF = bin counts, OUT = packed big-endian longs so the
  * histogram can live in a BINARY column and be merged/probed later. */
class HistogramSketch extends Aggregator[Double, Array[Long], Array[Byte]] {
  import HistogramSketch._
  override def zero: Array[Long] = new Array[Long](numBins)
  override def reduce(buf: Array[Long], v: Double): Array[Long] = {
    buf(bin(v)) += 1L
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
