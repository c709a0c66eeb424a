package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property-based contracts for the native kernels: the example specs
  * pin known answers; these pin the ALGEBRA over randomized inputs —
  * the invariants downstream operators actually rely on (symdelete
  * relies on Damerau being a metric; the z-order oracle relies on the
  * interleave being invertible; simhash banding relies on token-order
  * invariance). Plain scalacheck (Prop + Test.check) — no Spark
  * session needed, the kernels are static.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, min: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def u(s: String): UTF8String = UTF8String.fromString(s)
  private def arr(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => u(t): Any).toArray)

  // small alphabet maximizes edit/transposition interactions
  private val shortStr: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  private def dl(a: String, b: String): Int =
    DamerauKernel.distance(u(a), u(b))

  test("damerau is a true metric (triangle inequality — OSA fails this)") {
    // OSA (restricted transpositions) is NOT a metric: OSA('ca','abc')=3
    // but OSA('ca','ac')+OSA('ac','abc')=2. Unrestricted DL must satisfy
    // the triangle inequality on every triple — this property FAILS on
    // an OSA implementation within a few hundred random triples.
    check("triangle", Prop.forAll(shortStr, shortStr, shortStr) {
      (a, b, c) => dl(a, c) <= dl(a, b) + dl(b, c)
    }, min = 600)
    check("symmetry", Prop.forAll(shortStr, shortStr) {
      (a, b) => dl(a, b) == dl(b, a)
    })
    check("identity", Prop.forAll(shortStr, shortStr) {
      (a, b) => (dl(a, b) == 0) == (a == b)
    })
    check("bounds", Prop.forAll(shortStr, shortStr) { (a, b) =>
      val d = dl(a, b)
      d >= math.abs(a.length - b.length) &&
        d <= math.max(a.length, b.length)
    })
  }

  test("damerau: any single edit costs at most 1") {
    val edited: Gen[(String, String)] = for {
      s <- shortStr if s.nonEmpty
      kind <- Gen.chooseNum(0, 3)
      i <- Gen.chooseNum(0, s.length - 1)
      ch <- Gen.oneOf('a', 'b', 'c')
    } yield kind match {
      case 0 => (s, s.updated(i, ch))                      // substitute
      case 1 => (s, s.take(i) + ch + s.drop(i))            // insert
      case 2 => (s, s.take(i) + s.drop(i + 1))             // delete
      case _ if s.length >= 2 =>                           // adjacent swap
        val j = math.min(i, s.length - 2)
        (s, s.take(j) + s(j + 1) + s(j) + s.drop(j + 2))
      case _ => (s, s)
    }
    check("single-edit", Prop.forAll(edited) { case (a, b) =>
      dl(a, b) <= 1
    })
  }

  test("jaro-winkler: range, symmetry, identity, empty") {
    def jw(a: String, b: String): Double =
      JaroWinklerKernel.similarity(u(a), u(b))
    check("range+symmetry", Prop.forAll(shortStr, shortStr) { (a, b) =>
      val s = jw(a, b)
      s >= 0.0 && s <= 1.0 && s == jw(b, a)
    })
    check("identity", Prop.forAll(shortStr) { a =>
      if (a.isEmpty) jw(a, a) == 0.0 else jw(a, a) == 1.0
    })
    check("empty-is-zero", Prop.forAll(shortStr) { a =>
      jw(a, "") == 0.0 && jw("", a) == 0.0
    })
  }

  test("zorder interleave is invertible and range-bounded") {
    val coord = Gen.chooseNum(0L, (1L << ZorderKernel.BITS) - 1)
    // independent de-interleave: read back the even/odd bit positions
    def even(z: Long): Long = (0 until ZorderKernel.BITS)
      .map(i => ((z >> (2 * i)) & 1L) << i).reduce(_ | _)
    def odd(z: Long): Long = (0 until ZorderKernel.BITS)
      .map(i => ((z >> (2 * i + 1)) & 1L) << i).reduce(_ | _)
    check("roundtrip", Prop.forAll(coord, coord) { (x, y) =>
      val z = ZorderKernel.interleave(x, y)
      z >= 0L && z < (1L << (2 * ZorderKernel.BITS)) &&
        even(z) == x && odd(z) == y
    })
  }

  test("simhash is token-order invariant and deterministic") {
    val toks = Gen.listOf(Gen.oneOf("the", "cat", "sat", "on", "mat",
      "a", "dog", "ran"))
    val withSeed = for { t <- toks; seed <- Gen.chooseNum(0L, 1L << 40) }
      yield (t, seed)
    check("order-invariance", Prop.forAll(withSeed) { case (ts, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(ts)
      SimHashKernel.compute(arr(ts)) == SimHashKernel.compute(
        arr(shuffled)) &&
        SimHashKernel.compute(arr(ts)) == SimHashKernel.compute(arr(ts))
    })
  }

  test("winnow fingerprints are a subset of the k-gram hash set") {
    // w=1 degenerates to "every k-gram's hash, distinct" — the
    // reference universe; any w must select from inside it, never
    // invent a hash, and select at least one whenever a k-gram exists
    val toks = Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("aa", "bb", "cc", "dd", "ee")))
    val kw = for { k <- Gen.chooseNum(1, 4); w <- Gen.chooseNum(1, 6) }
      yield (k, w)
    def longs(a: org.apache.spark.sql.catalyst.util.ArrayData): Set[Long] =
      (0 until a.numElements()).map(a.getLong).toSet
    check("subset", Prop.forAll(toks, kw) { case (ts, (k, w)) =>
      val universe = longs(WinnowKernel.compute(arr(ts), k, 1))
      val selected = longs(WinnowKernel.compute(arr(ts), k, w))
      selected.subsetOf(universe) &&
        (universe.isEmpty || selected.nonEmpty)
    })
  }

  test("lcp agrees with the direct definition") {
    val withPrefix = for {
      p <- shortStr; a <- shortStr; b <- shortStr
    } yield (p + a, p + b)
    check("lcp", Prop.forAll(withPrefix) { case (a, b) =>
      val got = LcpKernel.lcp(u(a), u(b))
      val want = a.zip(b).takeWhile { case (x, y) => x == y }.length
      got == want
    })
  }

  test("count_in equals the brute membership count") {
    val toks = Gen.listOf(Gen.oneOf("x", "y", "z", "w"))
    val marks = Gen.someOf("x", "y", "z").map(_.toSeq)
    check("count-in", Prop.forAll(toks, marks) { (ts, ms) =>
      val set = new java.util.HashSet[UTF8String]()
      ms.foreach(m => set.add(u(m)))
      CountInKernel.count(arr(ts), set) == ts.count(ms.contains)
    })
  }

  test("eq_count equals the zip_with/aggregate padding algebra") {
    // the HOF reference: zip_with pads to the LONGER array with NULLs,
    // when(x === y) on a NULL is NULL, otherwise(0) absorbs it — so
    // eq_count must count only positions both present and equal
    val arrGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 4L)))
    def longArr(xs: Seq[Long]): GenericArrayData =
      new GenericArrayData(xs.map(x => x: Any).toArray)
    check("eq-count", Prop.forAll(arrGen, arrGen) { (a, b) =>
      val want = a.zip(b).count { case (x, y) => x == y }
      EqCountKernel.count(longArr(a), longArr(b)) == want
    })
    // null elements contribute 0, exactly like the padded NULLs
    val withNull = new GenericArrayData(Array[Any](1L, null, 3L))
    assert(EqCountKernel.count(withNull, longArr(Seq(1L, 2L, 3L))) == 2)
  }

  test("char entropy is bounded by log2 of the distinct-codepoint count") {
    val strs = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    check("entropy-bounds", Prop.forAll(strs) { s =>
      val h = TextNormKernel.charEntropy(u(s))
      val distinct = s.toSet.size
      h >= 0.0 &&
        (s.isEmpty || h <= math.log(distinct.toDouble) / math.log(2.0)
          + 1e-9)
    })
    // exactly log2(n) on a string with n distinct equi-frequent chars
    assert(math.abs(TextNormKernel.charEntropy(u("abcdabcd")) - 2.0)
      < 1e-12)
  }
}
