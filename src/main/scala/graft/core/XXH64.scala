package graft.core

/** xxHash64 (seeded), bit-compatible with Spark SQL's `xxhash64` builtin so
  * that node ids computed on the driver (literal resolution — the
  * reference's `Resolver`/`Lookup`, /root/reference/graph/iterator/
  * resolver.go) equal ids computed by distributed column expressions.
  * Algorithm per the public xxHash spec (Yann Collet); parity with Spark is
  * pinned by `XXH64ParitySpec`.
  */
object XXH64 {
  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def fmix(hashIn: Long): Long = {
    var hash = hashIn
    hash ^= hash >>> 33
    hash *= P2
    hash ^= hash >>> 29
    hash *= P3
    hash ^= hash >>> 32
    hash
  }

  /** 4-byte int input (Spark hashes IntegerType/ShortType/ByteType this way). */
  def hashInt(input: Int, seed: Long): Long = {
    var hash = seed + P5 + 4L
    hash ^= (input & 0xFFFFFFFFL) * P1
    hash = rotl(hash, 23) * P2 + P3
    fmix(hash)
  }

  /** 8-byte long input (LongType, TimestampType micros, Double bits). */
  def hashLong(input: Long, seed: Long): Long = {
    var hash = seed + P5 + 8L
    hash ^= rotl(input * P2, 31) * P1
    hash = rotl(hash, 27) * P1 + P4
    fmix(hash)
  }

  def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  private def get8(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) | ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) | ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  private def get4(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24)

  def hashBytes(bytes: Array[Byte], seed: Long): Long = {
    val length = bytes.length
    var hash = 0L
    var off = 0
    if (length >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (off <= length - 32) {
        v1 = rotl(v1 + get8(bytes, off) * P2, 31) * P1
        v2 = rotl(v2 + get8(bytes, off + 8) * P2, 31) * P1
        v3 = rotl(v3 + get8(bytes, off + 16) * P2, 31) * P1
        v4 = rotl(v4 + get8(bytes, off + 24) * P2, 31) * P1
        off += 32
      }
      hash = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      hash = (hash ^ rotl(v1 * P2, 31) * P1) * P1 + P4
      hash = (hash ^ rotl(v2 * P2, 31) * P1) * P1 + P4
      hash = (hash ^ rotl(v3 * P2, 31) * P1) * P1 + P4
      hash = (hash ^ rotl(v4 * P2, 31) * P1) * P1 + P4
    } else {
      hash = seed + P5
    }
    hash += length
    while (off <= length - 8) {
      hash ^= rotl(get8(bytes, off) * P2, 31) * P1
      hash = rotl(hash, 27) * P1 + P4
      off += 8
    }
    if (off <= length - 4) {
      hash ^= get4(bytes, off) * P1
      hash = rotl(hash, 23) * P2 + P3
      off += 4
    }
    while (off < length) {
      hash ^= (bytes(off) & 0xFFL) * P5
      hash = rotl(hash, 11) * P1
      off += 1
    }
    fmix(hash)
  }
}
