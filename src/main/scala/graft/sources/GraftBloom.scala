package graft.sources

/** The per-file Bloom filter the `bloomFor` write option publishes in the
  * `_stats` sidecar and [[JsonlV2.mayMatch]] probes for EqualTo/In
  * skipping — parquet's footer bloom filters, on text. Min/max ranges
  * prune range predicates but are useless for a point lookup on a
  * high-cardinality column over an unclustered layout (every file's
  * [min, max] contains every id); the bloom answers "definitely not in
  * this file" per file, so `WHERE doc_id = k` opens ~one file instead of
  * all of them.
  *
  * Determinism is the contract: the WRITER hashes the stored value and
  * the READER hashes the filter literal, and they must agree bit for bit
  * forever — both go through [[hashLong]]/[[hashBytes]] (splitmix64 /
  * FNV-1a, fixed constants, no JVM hash involvement). Standard
  * double-hashing: bit i of k is `h1 + i*h2 mod m`, m a power of two,
  * ~10 bits per distinct value (k = 7, FPR ≈ 1%). */
object GraftBloom {

  val K = 7

  /** A published filter: `k` probe positions over `words` (m = 64·len). */
  case class Bits(k: Int, words: Array[Long]) {
    def mightContain(h1: Long, h2: Long): Boolean = {
      val m = words.length.toLong * 64
      var i = 0
      while (i < k) {
        val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
        if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def hashLong(v: Long): (Long, Long) = (mix(v), mix(v ^ 0x5851F42D4C957F2DL))

  def hashBytes(b: Array[Byte]): (Long, Long) = {
    var h = 0xCBF29CE484222325L // FNV-1a 64
    var i = 0
    while (i < b.length) { h = (h ^ (b(i) & 0xFF)) * 0x100000001B3L; i += 1 }
    (mix(h), mix(h ^ 0x5851F42D4C957F2DL))
  }

  /** m bits for n distinct-ish values: ~10 bits/value, power of two,
    * floor 1024 (a 128-byte filter is free), cap 2^23 (1 MiB of bits —
    * a file bigger than that should have been split). */
  def sizeFor(n: Int): Long = {
    val want = math.max(1024L, n.toLong * 10)
    var m = 1024L
    while (m < want && m < (1L << 23)) m <<= 1
    m
  }

  /** Build the word array from accumulated (h1, h2) pairs, flattened as
    * [h1, h2, h1, h2, …]. */
  def build(pairs: Array[Long], nPairs: Int): Array[Long] = {
    val m = sizeFor(nPairs)
    val words = new Array[Long]((m >>> 6).toInt)
    var p = 0
    while (p < nPairs) {
      val h1 = pairs(2 * p); val h2 = pairs(2 * p + 1)
      var i = 0
      while (i < K) {
        val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
        words((bit >>> 6).toInt) |= (1L << (bit & 63))
        i += 1
      }
      p += 1
    }
    words
  }

  def wordsToBytes(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    words.foreach(bb.putLong)
    bb.array()
  }

  def bytesToWords(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}
