package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** In-memory reference BPE (Sennrich get_stats + greedy merge). */
  private def refBpe(words: Map[String, Long], n: Int)
      : Seq[(Int, String, String, Long)] = refBpeFull(words, n)._1

  /** Reference final segmentation after `n` merges (empty words have
    * no symbol rows, mirroring the operator's length guard).
    */
  private def refEncode(words: Map[String, Long], n: Int)
      : Map[String, Vector[String]] =
    refBpeFull(words, n)._2.filter(_._1.nonEmpty)

  private def refBpeFull(words: Map[String, Long], n: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    var state: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var k = 0
    var done = false
    while (k < n && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- state; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((k + 1, a, b, cnt))
        state = state.map { case (w, syms) =>
          val merged = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += syms(i); i += 1 }
          }
          w -> merged.toVector
        }
      }
      k += 1
    }
    (out.toSeq, state)
  }

  private def run(words: Map[String, Long], n: Int) =
    Bpe.bpeMerges(words.toSeq.toDF("word", "freq"), "word", "freq", n)
      .as[(Int, String, String, Long)].collect().toSeq

  test("hand-checked merges on a tiny vocabulary") {
    // 'ab' dominates: freq 5(abab has 2... no: per-occurrence within
    // word × word freq). abab: (a,b)x2,(b,a)x1 × 3; abc: (a,b),(b,c) × 2
    val words = Map("abab" -> 3L, "abc" -> 2L)
    val got = run(words, 2)
    assert(got == refBpe(words, 2))
    // first merge must be (a,b) with count 2*3 + 1*2 = 8
    assert(got.head == ((1, "a", "b", 8L)))
  }

  test("greedy left-to-right on runs: aaaa merges to aa,aa — count overlaps") {
    val words = Map("aaaa" -> 1L)
    val got = run(words, 2)
    // round 1: (a,a) counted at 3 adjacent positions (overlapping);
    // greedy apply keeps offsets 1,3 -> state aa,aa
    assert(got.head == ((1, "a", "a", 3L)))
    // round 2: the only pair left is (aa,aa)
    assert(got(1) == ((2, "aa", "aa", 1L)))
  }

  test("stops early when every word is fully merged") {
    val words = Map("ab" -> 2L, "cd" -> 1L)
    val got = run(words, 10)
    assert(got == refBpe(words, 10))
    assert(got.length == 2) // (a,b) and (c,d); then no pairs remain
  }

  test("empty words contribute no pairs (no phantom sequence rows)") {
    // sequence(1, 0) counts DOWN — without the length guard an empty
    // word would yield two empty-string symbols whose ("","") pair
    // (weighted by the word's freq) could win a round
    val words = Map("" -> 1000L, "ab" -> 1L)
    val got = run(words, 2)
    assert(got == Seq((1, "a", "b", 1L)))
  }

  test("random vocabularies match the reference (seeded property)") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 3) {
      val alphabet = "abcde"
      val words = (1 to 20).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          1L + rnd.nextInt(50))
      }.toMap
      assert(run(words, 5) == refBpe(words, 5))
    }
  }

  private def runEncode(words: Map[String, Long], n: Int)
      : Map[String, (Long, String)] =
    Bpe.encodedVocab(words.toSeq.toDF("word", "freq"), "word", "freq", n)
      .as[(String, Long, String)].collect()
      .map { case (w, ns, enc) => w -> ((ns, enc)) }.toMap

  test("encodedVocab is the reference segmentation after n merges") {
    val words = Map("abab" -> 3L, "abc" -> 2L, "x" -> 7L)
    val one = runEncode(words, 1)
    // merge 1 is (a,b) — both words segment on it; "x" stays atomic
    assert(one("abab") == ((2L, "ab ab")) && one("abc") == ((2L, "ab c")))
    assert(one("x") == ((1L, "x")))
    // merge 2 is (ab,ab): "abab" collapses to a single symbol
    val two = runEncode(words, 2)
    assert(two("abab") == ((1L, "abab")))
    assert(two == refEncode(words, 2).map { case (w, syms) =>
      w -> ((syms.length.toLong, syms.mkString(" ")))
    })
  }

  test("encodedVocab past exhaustion is a fixpoint (fully merged words)") {
    val words = Map("ab" -> 2L, "cd" -> 1L)
    // 10 requested, 2 possible: every word collapses to one symbol
    val got = runEncode(words, 10)
    assert(got == Map("ab" -> ((1L, "ab")), "cd" -> ((1L, "cd"))))
  }

  test("encodedVocab matches the reference on random vocabularies") {
    val rnd = new scala.util.Random(29)
    val alphabet = "abcd"
    val words = (1 to 25).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
        1L + rnd.nextInt(40))
    }.toMap
    val want = refEncode(words, 6).map { case (w, syms) =>
      w -> ((syms.length.toLong, syms.mkString(" ")))
    }
    assert(runEncode(words, 6) == want)
  }
}
