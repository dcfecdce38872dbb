package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter membership sketch (Bloom, "Space/time trade-offs in hash
  * coding with allowable errors", CACM 1970) as a typed `Aggregator` —
  * the broadcast-able prefilter for incremental dedup at scale: instead
  * of shuffling every new row against the accumulated fingerprint store,
  * a few-KB bitset built over the store is broadcast and prunes the
  * non-matching majority map-side; only bloom survivors pay the exact
  * join (false positives are then removed exactly, so the end-to-end
  * result is identical to the plain join — the rewrite is semantically
  * invisible, which keeps it oracle-checkable).
  *
  * Merge is a word-wise OR — associative, commutative, and therefore
  * partition-order independent: the bitset is bit-deterministic on any
  * cluster. Probes use double hashing (Kirsch–Mitzenstein, "Less
  * hashing, same performance", ESA 2006): position_i = h1 + i*h2 mod m,
  * with (h1, h2) supplied by the caller so the build side and the
  * probe side (SQL builtins over the hex image, see
  * [[graft.operators.ScalePatterns]]) share the identical positions.
  *
  * m = 2^15 bits (4 KB), k = 4 probes: at n = 5k keys the load is
  * kn/m ≈ 0.6 → false-positive rate ≈ (1-e^-0.6)^4 ≈ 2 %.
  */
object BloomSketch extends Aggregator[(Long, Long), Array[Byte], Array[Byte]] {

  val mBits = 1 << 15
  val numProbes = 4

  /** Probe bit positions for a (h1, h2) key — shared by reduce and the
    * SQL probe expression (same arithmetic, same positions). */
  def positions(h1: Long, h2: Long): Seq[Long] =
    (0 until numProbes).map(i => Math.floorMod(h1 + i.toLong * h2, mBits.toLong))

  def zero: Array[Byte] = new Array[Byte](mBits / 8)

  def reduce(b: Array[Byte], a: (Long, Long)): Array[Byte] = {
    positions(a._1, a._2).foreach { pos =>
      val p = pos.toInt
      b(p >> 3) = (b(p >> 3) | (1 << (p & 7))).toByte
    }
    b
  }

  def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
    b1
  }

  def finish(b: Array[Byte]): Array[Byte] = b

  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
