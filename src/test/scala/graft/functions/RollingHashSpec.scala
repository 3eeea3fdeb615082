package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class RollingHashSpec extends AnyFunSuite {
  test("window hashes: equal grams hash equal, count and alignment") {
    val s = "abcdefabcdefxyz"
    val L = 6
    val hs = RollingHash.windowHashes(s, L)
    assert(hs.length === s.length - L + 1)
    // the determinism the exact-verify stage relies on: equal substrings
    // produce equal hashes at any position
    for (i <- hs.indices; j <- hs.indices)
      if (s.substring(i, i + L) == s.substring(j, j + L))
        assert(hs(i) === hs(j), s"$i vs $j")
    assert(hs(0) === hs(6)) // "abcdef" twice
    // distinct windows of this string all differ (no collisions here)
    val grams = hs.indices.map(i => s.substring(i, i + L))
    assert(hs.distinct.length === grams.distinct.length)
  }

  test("short and exact-length inputs") {
    assert(RollingHash.windowHashes("abc", 4).isEmpty)
    assert(RollingHash.windowHashes("abcd", 4).length === 1)
    assert(RollingHash.windowHashes("", 1).isEmpty)
  }

  test("random cross-position parity with direct hashing") {
    val rnd = new scala.util.Random(5)
    val s = Array.fill(500)(('a' + rnd.nextInt(4)).toChar).mkString
    val L = 9
    val hs = RollingHash.windowHashes(s, L)
    // independent recompute of each window from scratch must agree —
    // the rolling update introduces no positional drift
    for (i <- hs.indices) {
      val direct = RollingHash.windowHashes(s.substring(i, i + L), L)
      assert(direct.length === 1 && hs(i) === direct(0), s"pos $i")
    }
    // 4-letter alphabet, 500 chars: repeats exist and must collide-by-value
    val byGram = hs.indices.groupBy(i => s.substring(i, i + L))
    byGram.values.filter(_.size > 1).foreach { idxs =>
      assert(idxs.map(hs).distinct.size === 1)
    }
  }

  test("code points: astral-plane input aligns with SQL substr semantics") {
    val s = "a😀b😀b" // a😀b😀b = 5 code points
    val hs = RollingHash.windowHashes(s, 2)
    assert(hs.length === 4)
    assert(hs(1) === hs(3)) // 😀b twice (code-point windows 2-3 and 4-5)
  }
}
