package graft.codec

/** Fixed-width bit packing (the FastPFOR role in the reference link set,
  * re-derived in pure Scala — see /root/reference/build.rs:83-84 for the
  * vendor lib the Rust binding pulls; no code taken from it).
  *
  * Packs `len` unsigned values of `width` bits (0..=64) into a byte
  * stream, little-endian bit order within the accumulator.
  */
object BitPack {

  /** Bits needed to represent unsigned value v (0 → 0 bits). */
  def bitsFor(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  def packedByteLen(len: Int, width: Int): Int = ((len.toLong * width + 7) / 8).toInt

  /** Pack values(i) (each must fit in `width` bits, width <= 32) into out. */
  def pack32(out: BufWriter, values: Array[Long], off: Int, len: Int, width: Int): Unit = {
    if (width == 0 || len == 0) return
    require(width <= 32, s"pack32 width $width")
    var acc = 0L
    var nbits = 0
    var i = 0
    while (i < len) {
      acc |= values(off + i) << nbits
      nbits += width
      while (nbits >= 8) {
        out.u8((acc & 0xff).toInt)
        acc >>>= 8
        nbits -= 8
      }
      i += 1
    }
    if (nbits > 0) out.u8((acc & 0xff).toInt)
  }

  /** Unpack len values of `width` bits from in into out (as unsigned longs). */
  def unpack32(in: BufReader, out: Array[Long], len: Int, width: Int): Unit = {
    if (width == 0) { java.util.Arrays.fill(out, 0, len, 0L); return }
    val mask = if (width >= 64) -1L else (1L << width) - 1
    var acc = 0L
    var nbits = 0
    var i = 0
    while (i < len) {
      while (nbits < width) {
        acc |= (in.u8().toLong & 0xffL) << nbits
        nbits += 8
      }
      out(i) = acc & mask
      acc >>>= width
      nbits -= width
      i += 1
    }
  }
}
