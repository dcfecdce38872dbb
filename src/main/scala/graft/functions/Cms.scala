package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005) as a typed [[Aggregator]] — the frequency-estimation sibling of
  * [[HllSketch]]: HLL answers "how many distinct", CMS answers "how often
  * does each item occur" in O(d·w) state per group regardless of stream
  * length, with the one-sided guarantee `estimate ≥ true count`
  * (overshoot ≤ εN with probability 1−δ for w = e/ε, d = ln 1/δ).
  *
  * Scale design: each partition folds its items into a local d×w counter
  * matrix; merge is elementwise sum — associative and commutative, so the
  * sketch is partition-order independent (bit-identical on any cluster
  * layout) and works unchanged as a streaming-window aggregate. Row
  * hashes reuse the engine-portable md5 idiom (first 8 hex chars → int)
  * of the LSH minhash family, which is what makes the sketch
  * oracle-checkable: counter[i][b] is by construction
  * `sum(ct) WHERE bucket_i(tok) = b` — a CMS row IS a bucketed group-by,
  * so a SQL engine replays the exact matrix (see SketchOps t17).
  */
object CmsSketch {
  val depth = 4
  val width = 256

  /** Reusable digest per thread: getInstance does a provider-registry
    * lookup per call, and reduce() invokes bucket() depth× per token —
    * the sketch's only per-row work. reset() + digest() is safe because
    * each partition task is single-threaded. */
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Row-i bucket of a token: first 8 md5 hex chars of "i:tok" as an
    * integer, mod width — identical to Spark SQL
    * `conv(substring(md5(concat(i, ':', tok)), 1, 8), 16, 10) % width`
    * and to the DuckDB hexToIntSql twin. */
  def bucket(i: Int, tok: String): Int = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s"$i:$tok".getBytes(StandardCharsets.UTF_8))
    // first 4 bytes = first 8 hex chars, as an unsigned 32-bit value
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % width).toInt
  }

  /** Point estimate from a packed sketch: min over the d row counters. */
  def estimate(sketch: Array[Byte], tok: String): Long = {
    val bb = ByteBuffer.wrap(sketch)
    (0 until depth)
      .map(i => bb.getLong((i * width + bucket(i, tok)) * 8))
      .min
  }
}

/** The Aggregator: IN = token, BUF = d×w counters, OUT = packed bytes
  * (big-endian longs) so the sketch itself can be stored in a BINARY
  * column, shipped between jobs, and probed later — the publish shape a
  * heavy-hitter service reads. */
class CmsSketch extends Aggregator[String, Array[Long], Array[Byte]] {
  import CmsSketch._
  override def zero: Array[Long] = new Array[Long](depth * width)
  override def reduce(buf: Array[Long], tok: String): Array[Long] = {
    var i = 0
    while (i < depth) { buf(i * width + bucket(i, tok)) += 1L; i += 1 }
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
