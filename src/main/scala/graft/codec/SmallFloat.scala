package graft.codec

/** 1-byte norm codec: float32 with 3-bit mantissa / 5-bit exponent,
  * exponent bias 15 ("byte315" in Lucene terms).
  *
  * Must be bit-exact with the reference for score parity:
  * /root/reference/src/core/util/SmallDouble.cpp:16-48 (which operates on
  * single-precision bits via MiscUtils::doubleToIntBits,
  * /root/reference/src/core/util/MiscUtils.cpp:61-86).
  */
object SmallFloat {

  def floatToByte(fIn: Float): Byte = {
    var f = fIn
    if (f < 0.0f) f = 0.0f // round negatives up to zero
    if (f == 0.0f) return 0 // zero is a special case
    val bits = java.lang.Float.floatToIntBits(f)
    var mantissa = (bits & 0xffffff) >> 21
    var exponent = (((bits >> 24) & 0x7f) - 63) + 15
    if (exponent > 31) { exponent = 31; mantissa = 7 } // overflow: max value
    if (exponent < 0) { exponent = 0; mantissa = 1 } // underflow: min value
    ((exponent << 3) | mantissa).toByte
  }

  def byteToFloat(b: Byte): Float = {
    if (b == 0) return 0.0f
    val mantissa = b & 7
    val exponent = (b >> 3) & 31
    val bits = ((exponent + (63 - 15)) << 24) | (mantissa << 21)
    java.lang.Float.intBitsToFloat(bits)
  }

  /** Decode table — the reference caches all 256 decodes
    * (/root/reference/src/core/search/Similarity.cpp:37-55). */
  val NormTable: Array[Float] = Array.tabulate(256)(i => byteToFloat(i.toByte))

  /** Lucene length norm: 1/sqrt(numTokens), quantized
    * (/root/reference/src/core/search/DefaultSimilarity.cpp:20-32). */
  def encodeNorm(numTokens: Int): Byte =
    if (numTokens <= 0) floatToByte(0.0f)
    else floatToByte((1.0 / math.sqrt(numTokens.toDouble)).toFloat)

  /** Approximate doc length recovered from a norm byte: 1/f^2 — the same
    * quantized doc length Lucene's BM25 uses when norms store 1/sqrt(dl). */
  def decodeDocLength(b: Byte): Float = {
    val f = NormTable(b & 0xff)
    if (f == 0.0f) 0.0f else 1.0f / (f * f)
  }
}
