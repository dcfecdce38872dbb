package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier,
  * "HyperLogLog: the analysis of a near-optimal cardinality estimation
  * algorithm", AofA 2007) as a typed `Aggregator` — the 100 TB-scale
  * sibling of the exact Set accumulator in
  * [[graft.operators.TypedAggs.DistinctCount]] (the reference's
  * TradeProvinceOrderBean.java:40-41 acc). A register array is O(m)
  * per group regardless of cardinality, and merge is a per-register max
  * — associative, commutative, and therefore partition-order
  * independent: the estimate is bit-deterministic on any cluster.
  *
  * p = 12 → m = 4096 byte registers (4 KB per group buffer),
  * standard error 1.04/sqrt(m) ≈ 1.6 %.
  */
object HllSketch extends Aggregator[Long, Array[Byte], Long] {

  val p = 12
  val m: Int = 1 << p

  /** splitmix64 finalizer (Steele/Lea/Flood, public domain) — a strong
    * 64-bit mix so register index and rank are uniform. */
  private[functions] def hash64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def zero: Array[Byte] = new Array[Byte](m)

  def reduce(b: Array[Byte], a: Long): Array[Byte] = {
    val h = hash64(a)
    val idx = (h >>> (64 - p)).toInt
    // rank = leading-zero count of the remaining 64-p bits, + 1
    val w = h << p
    val rho = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w))
      .min(64 - p) + 1
    if (rho > (b(idx) & 0xff)) b(idx) = rho.toByte
    b
  }

  def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if ((b2(i) & 0xff) > (b1(i) & 0xff)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  def finish(b: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = b(i) & 0xff
      sum += java.lang.Math.scalb(1.0, -r) // 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / sum
    // small-range (linear counting) correction; the 64-bit hash makes
    // the classic large-range correction unnecessary
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
    math.rint(corrected).toLong
  }

  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** [[HllSketch]]'s PARTIAL form: same registers, finished as the raw
  * byte array instead of the estimate — the re-aggregable measure a
  * summary table stores per group (plans/AggRewrite's "hll" op).
  * Because merge is a per-register max, the merge of stored partials
  * carries exactly the registers a direct [[HllSketch]] pass over the
  * union would — so an estimate derived from partials is BIT-EQUAL to
  * the raw one, and HLL navigation stays inside the rewrite's
  * bit-invisibility contract (unlike floating-point re-aggregation). */
object HllSketchPartial extends Aggregator[Long, Array[Byte], Array[Byte]] {
  def zero: Array[Byte] = HllSketch.zero
  def reduce(b: Array[Byte], a: Long): Array[Byte] = HllSketch.reduce(b, a)
  def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    HllSketch.merge(b1, b2)
  def finish(b: Array[Byte]): Array[Byte] = b
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merge of stored [[HllSketchPartial]] sketches FINISHED as the raw
  * registers — re-aggregation to a coarser grain (a month summary's
  * sketch from day partials) without losing re-aggregability.
  * Register-max merging keeps the coarse partial BIT-equal to one
  * built directly from the base rows, which is what lets
  * summary-on-summary rollup builds navigate. */
object HllMergePartial
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  def zero: Array[Byte] = HllSketch.zero
  def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
    if (a == null) b else HllSketch.merge(b, a)
  def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    HllSketch.merge(b1, b2)
  def finish(b: Array[Byte]): Array[Byte] = b
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merge-and-estimate over stored [[HllSketchPartial]] sketches: the
  * re-aggregation side of HLL navigation. A null input (a summary read
  * through an outer shape) merges as empty. */
object HllMerge extends Aggregator[Array[Byte], Array[Byte], Long] {
  def zero: Array[Byte] = HllSketch.zero
  def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
    if (a == null) b else HllSketch.merge(b, a)
  def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    HllSketch.merge(b1, b2)
  def finish(b: Array[Byte]): Long = HllSketch.finish(b)
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
