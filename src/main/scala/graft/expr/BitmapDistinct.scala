package graft.expr

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** EXACT distinct counting over a BOUNDED non-negative id domain via a
  * dense bitmap — the typed `Aggregator` (UDAF) face of the extension
  * surface (the codegen `Expression`s in this package are the other).
  *
  * Why it exists: `count(DISTINCT x)` plans a full de-duplicating
  * shuffle of the VALUES; `approx_count_distinct` is one pass but
  * approximate. When ids live in a known dense range (row ids assigned
  * by [[graft.linkage.UProbs.withSyntheticId]], dictionary-encoded
  * entities, customer keys), a fixed-size bitmap gives the exact
  * answer in one pass with map-side partial aggregation: the buffer is
  * `maxId/8` bytes regardless of group size, merge is bytewise OR
  * (associative + commutative → deterministic under ANY merge order),
  * finish is a popcount. 1.5M ids = a 188 KB buffer.
  *
  * Out-of-range or negative ids fail loudly — a silently dropped id
  * would make the "exact" contract a lie.
  */
final class BitmapDistinct(maxId: Long) extends Aggregator[Long, Array[Byte], Long] {
  require(maxId >= 0 && maxId < (1L << 33),
    s"maxId must be in [0, 2^33) — the bitmap is maxId/8 bytes; got $maxId")
  private val nBytes = (maxId / 8 + 1).toInt

  override def zero: Array[Byte] = new Array[Byte](nBytes)

  override def reduce(buf: Array[Byte], v: Long): Array[Byte] = {
    require(v >= 0 && v <= maxId, s"BitmapDistinct: id $v outside [0, $maxId]")
    buf((v >> 3).toInt) = (buf((v >> 3).toInt) | (1 << (v & 7)).toByte).toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < nBytes) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Long = {
    var (i, n) = (0, 0L)
    while (i < nBytes) { n += Integer.bitCount(buf(i) & 0xff); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object BitmapDistinct {
  /** Column function: `bitmapDistinct(maxId)(col)` ≡ exact
    * `count(DISTINCT col)` for ids in [0, maxId].
    */
  def bitmapDistinct(maxId: Long)(c: Column): Column =
    udaf(new BitmapDistinct(maxId), Encoders.scalaLong).apply(c)
}
