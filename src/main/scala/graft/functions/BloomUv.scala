package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Fidelity-mode approximate distinct count reproducing the
  * reference's Bloom-bitmap UV semantics (NF/app/UvWithBloom.scala:
  * 74-114): a single polynomial string hash (seed 61) into a bitmap of
  * `bits` bits; the UV estimate is the number of set bits, so hash
  * collisions undercount exactly as the reference's Redis bitmap does.
  *
  * Engineering differences from the reference, deliberately: the
  * bitmap lives in the aggregation buffer (partial-mergeable via
  * bitwise OR — distributes and needs no external store), and capacity
  * is a constructor parameter (the reference pins 1<<28; tests use
  * smaller). The idiomatic default for production remains
  * `approx_count_distinct` (HLL++, q5_uv_approx); this aggregator
  * exists to reproduce the reference's exact numbers when required.
  */
class BloomUv(bits: Int) extends Aggregator[Long, Array[Byte], Long] {
  require(bits > 0 && (bits & (bits - 1)) == 0, "bits must be a power of two")

  /** Polynomial hash, seed 61, over the decimal rendering of the id —
    * the reference's `Bloom.hash(value, 61)` semantics, except the
    * accumulator folds under a 2^40 mask each step. The reference lets
    * the Java Long silently wrap for long inputs; a SQL BIGINT raises
    * on the same overflow, so wrap-dependent values could never be
    * oracle-checked. The mask keeps every intermediate below 2^46
    * (exactly reproducible in any 64-bit engine) and subsumes the
    * final `bits-1` mask, so distribution over the bitmap is
    * unchanged for inputs the reference handles.
    */
  private def hash(id: Long): Int = BloomUv.bucket(id, bits)

  override def zero: Array[Byte] = new Array[Byte](bits / 8)

  override def reduce(buf: Array[Byte], id: Long): Array[Byte] = {
    val bit = hash(id)
    buf(bit >>> 3) = (buf(bit >>> 3) | (1 << (bit & 7))).toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Long = {
    var n = 0L
    var i = 0
    while (i < buf.length) { n += java.lang.Integer.bitCount(buf(i) & 0xff); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object BloomUv {
  /** Accumulator mask (2^40 - 1): keeps `h*61 + char` below 2^46. */
  val AccMask: Long = (1L << 40) - 1

  /** The seed-61 polynomial bucket of an id — shared by the batch
    * aggregator and the streaming continuous-UV state machine so both
    * count the identical collision-lossy buckets.
    */
  def bucket(id: Long, bits: Int): Int = {
    val s = java.lang.Long.toString(id)
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 61 + s.charAt(i)) & AccMask; i += 1 }
    (h & (bits - 1)).toInt
  }

  /** Column aggregate: Bloom-bitmap UV with `bits` capacity. */
  def bloomUv(c: Column, bits: Int): Column =
    udaf(new BloomUv(bits), Encoders.scalaLong).apply(c)
}
