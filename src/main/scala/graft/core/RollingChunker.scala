package graft.core

/** Content-defined chunking via a Karp-Rabin rolling hash — the "rolling
  * hash document fingerprint" operator: boundaries fall where the w-byte
  * window hash has its low `maskBits` bits zero, so chunk edges are
  * content-anchored and survive insertions/deletions (unlike fixed-size
  * blocks). The standard partial-duplicate / delta-storage primitive (cf.
  * LBFS/rsync-style CDC).
  *
  * All arithmetic is WRAPPING 64-bit (JVM long semantics; the python oracle
  * twin masks to 64 bits each step), so results are bit-portable.
  */
object RollingChunker {

  val Base = 153191L
  val Window = 32
  val MaskBits = 6 // boundary probability 1/64 per position -> ~64B+min avg chunks
  val MinLen = 16
  val MaxLen = 256

  /** End offsets (exclusive) of each chunk of `bytes`. Deterministic, total:
    * offsets are strictly increasing and the last equals bytes.length. */
  def boundaries(
      bytes: Array[Byte],
      w: Int = Window,
      maskBits: Int = MaskBits,
      minLen: Int = MinLen,
      maxLen: Int = MaxLen
  ): Vector[Int] = {
    require(w >= 1 && minLen >= 1 && maxLen >= minLen)
    val mask = (1L << maskBits) - 1
    // B^w with wrap-around, for removing the outgoing byte
    var bw = 1L
    var k = 0
    while (k < w) { bw *= Base; k += 1 }

    val out = Vector.newBuilder[Int]
    var h = 0L
    var chunkStart = 0
    var i = 0
    while (i < bytes.length) {
      val in = (bytes(i) & 0xff).toLong
      h = h * Base + in
      if (i - chunkStart >= w) {
        val outByte = (bytes(i - w) & 0xff).toLong
        h -= outByte * bw
      }
      val len = i - chunkStart + 1
      if (len >= maxLen || (len >= minLen && (h & mask) == 0L)) {
        out += i + 1
        chunkStart = i + 1
        h = 0L // hash restarts per chunk: boundaries depend only on chunk-local bytes
      }
      i += 1
    }
    if (chunkStart < bytes.length) out += bytes.length
    out.result()
  }
}
