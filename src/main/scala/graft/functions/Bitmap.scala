package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Roaring-style EXACT-distinct bitmap over 64-bit ids (Chambi, Lemire,
  * Kaser, Godin, "Better bitmap performance with Roaring bitmaps",
  * Software: Practice & Experience 2016) — the exact sibling of
  * [[HllSketch]] and the re-aggregable currency behind the reference's
  * Doris `BITMAP_UNION` UV columns (DWS tables keep a per-window bitmap
  * so ADS can union windows without re-reading facts). Values are split
  * into a 48-bit container key and a 16-bit low part; each container is
  * either a sorted char array (≤ 4096 entries, 2 B/id) or an 8 KiB
  * fixed bitset, upgraded on crossing the threshold — so a group's
  * footprint is proportional to its id count when sparse and capped at
  * 8 KiB per 65 536-id block when dense. Union (the merge) is
  * associative, commutative, and idempotent, which makes the stored
  * partial exactly re-aggregable: the union of per-group bitmaps IS the
  * bitmap of the union, so a `count(DISTINCT id)` derived from stored
  * partials is BIT-EQUAL to the raw pass (unlike any sketch, there is
  * no estimation error to reason about).
  *
  * Mutable builder used as the Aggregator buffer (object-hash
  * aggregation); the STORED form is [[Bitmap64.serialize]]'s canonical
  * byte layout — containers in ascending key order, array containers
  * sorted — so equal id sets serialize to equal bytes regardless of
  * insertion or merge order (the staleness-fence digests stay
  * deterministic).
  */
final class Bitmap64 extends Serializable {

  import Bitmap64._

  // key-sorted so iteration (and therefore serialization) is canonical
  private[functions] val containers =
    new java.util.TreeMap[java.lang.Long, AnyRef]()

  def add(v: Long): Unit = {
    val key = java.lang.Long.valueOf(v >>> 16)
    val low = (v & 0xffffL).toChar
    containers.get(key) match {
      case null =>
        val a = new ArrayC
        a.insert(low)
        containers.put(key, a)
      case a: ArrayC =>
        if (a.n >= UpgradeAt && !a.contains(low))
          containers.put(key, a.toBitset.set(low))
        else a.insert(low)
      case b: BitC => b.set(low)
    }
  }

  /** In-place union; `other` is not mutated and never aliased (adopted
    * containers are deep-copied — Aggregator merge may retain either
    * buffer). Returns `this`. */
  def or(other: Bitmap64): Bitmap64 = {
    val it = other.containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      containers.get(e.getKey) match {
        case null => containers.put(e.getKey, copyC(e.getValue))
        case mine => containers.put(e.getKey, unionC(mine, e.getValue))
      }
    }
    this
  }

  def cardinality: Long = {
    var total = 0L
    val it = containers.values().iterator()
    while (it.hasNext) it.next() match {
      case a: ArrayC => total += a.n
      case b: BitC => total += b.cardinality
    }
    total
  }

  /** Intersection into a FRESH bitmap; neither operand is mutated or
    * aliased. Containers absent from either side vanish; a dense
    * intersection result below the upgrade threshold downgrades to the
    * array form, preserving the canonical-serialization invariant
    * (equal sets ⇒ equal bytes however they were produced). */
  def and(other: Bitmap64): Bitmap64 = {
    val out = new Bitmap64
    val it = containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      other.containers.get(e.getKey) match {
        case null => ()
        case theirs =>
          Bitmap64.intersectC(e.getValue, theirs) match {
            case null => ()
            case c => out.containers.put(e.getKey, c)
          }
      }
    }
    out
  }

  /** |this ∩ other| without materializing the intersection payloads —
    * the audience-overlap kernel (Doris BITMAP_AND_COUNT). */
  def andCardinality(other: Bitmap64): Long = {
    var total = 0L
    val it = containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      other.containers.get(e.getKey) match {
        case null => ()
        case theirs =>
          total += Bitmap64.intersectCard(e.getValue, theirs)
      }
    }
    total
  }

  def contains(v: Long): Boolean =
    containers.get(java.lang.Long.valueOf(v >>> 16)) match {
      case null => false
      case a: ArrayC => a.contains((v & 0xffffL).toChar)
      case b: BitC => b.get((v & 0xffffL).toChar)
    }

  /** Canonical bytes: container count, then per container the 48-bit
    * key (as a long), a type tag, and the payload (sorted chars or the
    * fixed 1024 words). */
  def serialize: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(containers.size())
    val it = containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey.longValue())
      e.getValue match {
        case a: ArrayC =>
          out.writeByte(0)
          out.writeInt(a.n)
          var i = 0
          while (i < a.n) { out.writeChar(a.vs(i)); i += 1 }
        case b: BitC =>
          out.writeByte(1)
          var i = 0
          while (i < Words) { out.writeLong(b.words(i)); i += 1 }
      }
    }
    out.flush()
    bos.toByteArray
  }
}

object Bitmap64 {

  /** Array containers upgrade to bitsets past this many entries — the
    * roaring crossover (4096 × 2 B = 8 KiB, the bitset's fixed cost). */
  val UpgradeAt = 4096
  private val Words = 1024 // 65536 bits

  /** Sorted-char-array container (sparse form). */
  private[functions] final class ArrayC extends Serializable {
    var n: Int = 0
    var vs: Array[Char] = new Array[Char](8)

    private def find(v: Char): Int = {
      // binary search over the live prefix; returns insertion point
      // encoded as -(pos)-1 when absent (java.util.Arrays contract)
      var lo = 0
      var hi = n - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (vs(mid) < v) lo = mid + 1
        else if (vs(mid) > v) hi = mid - 1
        else return mid
      }
      -(lo + 1)
    }

    def contains(v: Char): Boolean = find(v) >= 0

    def insert(v: Char): Unit = {
      val pos = find(v)
      if (pos < 0) {
        val at = -(pos + 1)
        if (n == vs.length) {
          val grown = new Array[Char](vs.length * 2)
          System.arraycopy(vs, 0, grown, 0, n)
          vs = grown
        }
        System.arraycopy(vs, at, vs, at + 1, n - at)
        vs(at) = v
        n += 1
      }
    }

    def toBitset: BitC = {
      val b = new BitC
      var i = 0
      while (i < n) { b.set(vs(i)); i += 1 }
      b
    }

    def copy(): ArrayC = {
      val c = new ArrayC
      c.n = n
      c.vs = java.util.Arrays.copyOf(vs, math.max(n, 8))
      c
    }
  }

  /** Fixed 8 KiB bitset container (dense form). */
  private[functions] final class BitC extends Serializable {
    val words: Array[Long] = new Array[Long](Words)
    def set(v: Char): BitC = {
      words(v >>> 6) |= 1L << (v & 63)
      this
    }
    def get(v: Char): Boolean = ((words(v >>> 6) >>> (v & 63)) & 1L) == 1L
    def cardinality: Long = {
      var c = 0L
      var i = 0
      while (i < Words) { c += java.lang.Long.bitCount(words(i)); i += 1 }
      c
    }
    def copy(): BitC = {
      val b = new BitC
      System.arraycopy(words, 0, b.words, 0, Words)
      b
    }
  }

  private def copyC(c: AnyRef): AnyRef = c match {
    case a: ArrayC => a.copy()
    case b: BitC => b.copy()
  }

  /** Union of two containers into a fresh-or-`mine` container; `theirs`
    * is never mutated or aliased. */
  private def unionC(mine: AnyRef, theirs: AnyRef): AnyRef = (mine, theirs) match {
    case (a: ArrayC, b: ArrayC) =>
      // merge the sorted runs; spill to a bitset past the threshold
      val out = new ArrayC
      out.vs = new Array[Char](math.min(a.n + b.n, UpgradeAt + 1).max(8))
      var i = 0
      var j = 0
      var overflow: BitC = null
      def push(v: Char): Unit =
        if (overflow != null) { overflow.set(v); () }
        else if (out.n >= UpgradeAt) { overflow = out.toBitset.set(v); () }
        else { out.vs(out.n) = v; out.n += 1 }
      while (i < a.n && j < b.n) {
        if (a.vs(i) < b.vs(j)) { push(a.vs(i)); i += 1 }
        else if (a.vs(i) > b.vs(j)) { push(b.vs(j)); j += 1 }
        else { push(a.vs(i)); i += 1; j += 1 }
      }
      while (i < a.n) { push(a.vs(i)); i += 1 }
      while (j < b.n) { push(b.vs(j)); j += 1 }
      if (overflow != null) overflow else out
    case (a: ArrayC, b: BitC) =>
      val out = b.copy()
      var i = 0
      while (i < a.n) { out.set(a.vs(i)); i += 1 }
      out
    case (a: BitC, b: ArrayC) =>
      var i = 0
      while (i < b.n) { a.set(b.vs(i)); i += 1 }
      a
    case (a: BitC, b: BitC) =>
      var i = 0
      while (i < Words) { a.words(i) |= b.words(i); i += 1 }
      a
  }

  /** Fresh intersection container, or null when empty; downgrades a
    * sparse bitset result to the array form (canonical invariant). */
  private def intersectC(mine: AnyRef, theirs: AnyRef): AnyRef = {
    def arrayBit(a: ArrayC, b: BitC): AnyRef = {
      val out = new ArrayC
      var i = 0
      while (i < a.n) {
        if (b.get(a.vs(i))) out.insert(a.vs(i))
        i += 1
      }
      if (out.n == 0) null else out
    }
    (mine, theirs) match {
      case (a: ArrayC, b: ArrayC) =>
        val out = new ArrayC
        var i = 0
        var j = 0
        while (i < a.n && j < b.n) {
          if (a.vs(i) < b.vs(j)) i += 1
          else if (a.vs(i) > b.vs(j)) j += 1
          else { out.insert(a.vs(i)); i += 1; j += 1 }
        }
        if (out.n == 0) null else out
      case (a: ArrayC, b: BitC) => arrayBit(a, b)
      case (a: BitC, b: ArrayC) => arrayBit(b, a)
      case (a: BitC, b: BitC) =>
        val out = new BitC
        var card = 0L
        var i = 0
        while (i < Words) {
          out.words(i) = a.words(i) & b.words(i)
          card += java.lang.Long.bitCount(out.words(i))
          i += 1
        }
        if (card == 0) null
        else if (card <= UpgradeAt) {
          // downgrade: a direct build of this set would be an array
          val arr = new ArrayC
          var v = 0
          while (v < 65536) {
            if (out.get(v.toChar)) arr.insert(v.toChar)
            v += 1
          }
          arr
        } else out
    }
  }

  /** |mine ∩ theirs| without building the result container. */
  private def intersectCard(mine: AnyRef, theirs: AnyRef): Long = {
    def arrayBit(a: ArrayC, b: BitC): Long = {
      var c = 0L
      var i = 0
      while (i < a.n) { if (b.get(a.vs(i))) c += 1; i += 1 }
      c
    }
    (mine, theirs) match {
      case (a: ArrayC, b: ArrayC) =>
        var c = 0L
        var i = 0
        var j = 0
        while (i < a.n && j < b.n) {
          if (a.vs(i) < b.vs(j)) i += 1
          else if (a.vs(i) > b.vs(j)) j += 1
          else { c += 1; i += 1; j += 1 }
        }
        c
      case (a: ArrayC, b: BitC) => arrayBit(a, b)
      case (a: BitC, b: ArrayC) => arrayBit(b, a)
      case (a: BitC, b: BitC) =>
        var c = 0L
        var i = 0
        while (i < Words) {
          c += java.lang.Long.bitCount(a.words(i) & b.words(i))
          i += 1
        }
        c
    }
  }

  def deserialize(bytes: Array[Byte]): Bitmap64 = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val bm = new Bitmap64
    val nc = in.readInt()
    var c = 0
    while (c < nc) {
      val key = java.lang.Long.valueOf(in.readLong())
      in.readByte() match {
        case 0 =>
          val n = in.readInt()
          val a = new ArrayC
          a.n = n
          a.vs = new Array[Char](math.max(n, 8))
          var i = 0
          while (i < n) { a.vs(i) = in.readChar(); i += 1 }
          bm.containers.put(key, a)
        case 1 =>
          val b = new BitC
          var i = 0
          while (i < Words) { b.words(i) = in.readLong(); i += 1 }
          bm.containers.put(key, b)
        case t => throw new java.io.IOException(s"bad container tag $t")
      }
      c += 1
    }
    bm
  }
}

/** Per-group bitmap PARTIAL: the re-aggregable measure a summary table
  * stores (plans/AggRewrite's "bitmap" op). Null ids are skipped —
  * matching `count(DISTINCT x)`'s non-null contract. Because union is
  * idempotent, the merge of stored partials carries exactly the id set
  * a direct pass over the union of the base rows would — so a count
  * derived from partials is EXACT, and bitmap navigation can serve the
  * one aggregate every sketch must refuse: exact distinct. */
object BitmapPartial
    extends Aggregator[java.lang.Long, Bitmap64, Array[Byte]] {
  def zero: Bitmap64 = new Bitmap64
  def reduce(b: Bitmap64, a: java.lang.Long): Bitmap64 = {
    if (a != null) b.add(a.longValue())
    b
  }
  def merge(b1: Bitmap64, b2: Bitmap64): Bitmap64 = b1.or(b2)
  def finish(b: Bitmap64): Array[Byte] = b.serialize
  def bufferEncoder: Encoder[Bitmap64] =
    Encoders.javaSerialization[Bitmap64]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Direct exact-distinct over raw ids — `count(DISTINCT x)` as ONE
  * non-distinct aggregation pass (no Expand, no second shuffle): each
  * task builds a bitmap, tasks merge by union, finish counts. The 100 TB
  * win over Spark's planned distinct is that the per-group state is a
  * compressed id set (2 B/id sparse, 8 KiB/64 Ki-block dense) that
  * merges in container-sized strides instead of a row-per-id exchange. */
object BitmapDistinct extends Aggregator[java.lang.Long, Bitmap64, Long] {
  def zero: Bitmap64 = new Bitmap64
  def reduce(b: Bitmap64, a: java.lang.Long): Bitmap64 = {
    if (a != null) b.add(a.longValue())
    b
  }
  def merge(b1: Bitmap64, b2: Bitmap64): Bitmap64 = b1.or(b2)
  def finish(b: Bitmap64): Long = b.cardinality
  def bufferEncoder: Encoder[Bitmap64] =
    Encoders.javaSerialization[Bitmap64]
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Merge-and-count over STORED [[BitmapPartial]] bytes: the
  * re-aggregation side of exact-distinct navigation. A null input (a
  * summary read through an outer shape) merges as empty. */
object BitmapMergeCount
    extends Aggregator[Array[Byte], Bitmap64, Long] {
  def zero: Bitmap64 = new Bitmap64
  def reduce(b: Bitmap64, a: Array[Byte]): Bitmap64 =
    if (a == null) b else b.or(Bitmap64.deserialize(a))
  def merge(b1: Bitmap64, b2: Bitmap64): Bitmap64 = b1.or(b2)
  def finish(b: Bitmap64): Long = b.cardinality
  def bufferEncoder: Encoder[Bitmap64] =
    Encoders.javaSerialization[Bitmap64]
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Merge of stored partials FINISHED as bytes — re-aggregation to a
  * coarser grain (month partials from day partials) without losing the
  * id set; idempotent union keeps the coarse partial bit-equal to one
  * built directly from the base. */
object BitmapMergePartial
    extends Aggregator[Array[Byte], Bitmap64, Array[Byte]] {
  def zero: Bitmap64 = new Bitmap64
  def reduce(b: Bitmap64, a: Array[Byte]): Bitmap64 =
    if (a == null) b else b.or(Bitmap64.deserialize(a))
  def merge(b1: Bitmap64, b2: Bitmap64): Bitmap64 = b1.or(b2)
  def finish(b: Bitmap64): Array[Byte] = b.serialize
  def bufferEncoder: Encoder[Bitmap64] =
    Encoders.javaSerialization[Bitmap64]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
