package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Direct-kernel property tests (no Spark jobs — the static compute
  * methods the generated code calls). Seeded fuzz incl. multibyte
  * UTF-8; complements HashOpsSpec's DataFrame-level equivalence. */
class KernelPropertiesSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(99)
  private val alphabets = Seq("abcde ", "日本語中文 ", "αβγδ ", "a1!@ \t")
  private def word(): String = {
    val alpha = alphabets(rnd.nextInt(alphabets.size))
    (0 until rnd.nextInt(40)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
  }
  private def u(s: String): UTF8String = UTF8String.fromString(s)

  test("ShingleHashes: window count = max(codepoints - n + 1, 1)") {
    (0 until 500).foreach { _ =>
      val s = word()
      val n = 1 + rnd.nextInt(7)
      val got = ShingleHashes.computeRaw(u(s), n).length
      val cps = s.codePointCount(0, s.length)
      assert(got === math.max(cps - n + 1, 1), s"'$s' n=$n")
    }
  }

  test("ShingleHashes: each window hash = Md5Prefix32 of the window text") {
    (0 until 200).foreach { _ =>
      val s = word()
      val n = 1 + rnd.nextInt(5)
      val hashes = ShingleHashes.computeRaw(u(s), n)
      val cps = s.codePoints().toArray
      val windows = math.max(cps.length - n + 1, 1)
      (0 until windows).foreach { i =>
        val end = math.min(i + n, cps.length)
        val win = new String(cps, i, end - i)
        assert(hashes(i) === Md5Prefix32.compute(u(win)), s"'$s' n=$n i=$i")
      }
    }
  }

  test("Md5Prefix32 stays in uint32 range and differs across inputs") {
    val vals = (0 until 2000).map(i => Md5Prefix32.compute(u(s"key-$i")))
    assert(vals.forall(v => v >= 0L && v < (1L << 32)))
    assert(vals.distinct.size > 1990) // ~no collisions at this scale
  }

  test("SortedIntersectCount: symmetric, bounded, self = size") {
    (0 until 500).foreach { _ =>
      val a = (0 until rnd.nextInt(50)).map(_ => rnd.nextInt(60).toLong)
        .distinct.sorted.toArray
      val b = (0 until rnd.nextInt(50)).map(_ => rnd.nextInt(60).toLong)
        .distinct.sorted.toArray
      def arr(x: Array[Long]) =
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(x)
      val ab = SortedIntersectCount.compute(arr(a), arr(b))
      val ba = SortedIntersectCount.compute(arr(b), arr(a))
      assert(ab === ba)
      assert(ab <= math.min(a.length, b.length))
      assert(SortedIntersectCount.compute(arr(a), arr(a)) === a.length)
      assert(ab === a.toSet.intersect(b.toSet).size)
    }
  }

  test("MinhashSignature: permutation-monotone under text containment") {
    // appending text can only LOWER each signature minimum (more shingles
    // → min over a superset) — the property LSH similarity relies on
    (0 until 200).foreach { _ =>
      val s1 = word()
      val s2 = s1 + word()
      val n = 3
      def sig(s: String): Seq[Long] = {
        val a = MinhashSignature.compute(u(s), n, 8)
        (0 until 8).map(a.getLong)
      }
      if (s1.codePointCount(0, s1.length) >= n) {
        sig(s1).zip(sig(s2)).foreach { case (m1, m2) =>
          assert(m2 <= m1, s"'$s1' -> '$s2'")
        }
      }
    }
  }

  test("NormalizedName: idempotent through the kernel") {
    (0 until 300).foreach { _ =>
      val s = word()
      val once = NormalizedName.compute(u(s)).getUTF8String(0)
      // norm of norm == norm (tokens already expanded & suffix-free)
      val twice = NormalizedName.compute(once).getUTF8String(0)
      assert(once.toString === twice.toString, s"'$s'")
    }
  }
}
