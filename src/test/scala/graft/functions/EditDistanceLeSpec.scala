package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class EditDistanceLeSpec extends AnyFunSuite {

  private def full(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def banded(a: String, b: String, k: Int): Int =
    EditDistanceLe.banded(UTF8String.fromString(a),
      UTF8String.fromString(b), k)

  test("banded equals full DP clamped at k on random strings") {
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 3000) {
      val a = (0 until rnd.nextInt(12)).map(_ =>
        ('a' + rnd.nextInt(3)).toChar).mkString
      val b = (0 until rnd.nextInt(12)).map(_ =>
        ('a' + rnd.nextInt(3)).toChar).mkString
      val k = rnd.nextInt(4)
      val exact = full(a, b)
      val expect = if (exact <= k) exact else -1
      assert(banded(a, b, k) === expect, s"a=$a b=$b k=$k exact=$exact")
    }
  }

  test("banded: boundary cases (empties, identical, length gap)") {
    assert(banded("", "", 0) === 0)
    assert(banded("ab", "", 2) === 2)
    assert(banded("ab", "", 1) === -1)
    assert(banded("", "abc", 3) === 3)
    assert(banded("same", "same", 0) === 0)
    assert(banded("abcdef", "abXdef", 1) === 1)
    assert(banded("abcdef", "aXcdeY", 1) === -1)
    assert(banded("abc", "abcdefg", 2) === -1) // length gap 4 > k
  }
}
