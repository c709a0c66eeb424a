package graft

import org.apache.spark.sql.functions._

/** Pins [[StageScale]]'s staging contract — the scale leg's numbers
  * are only meaningful if the staged twin scales the way an organic
  * corpus would: referential integrity preserved across shifted key
  * families, and content columns perturbed per copy (r14: verbatim
  * text made symdelete blocks emit ~copies² pairs for copies× data,
  * which excluded q142 from the scale leg).
  */
class StageScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("widen shifts every key column by the same per-copy constant") {
    val src = Seq((1L, 10L), (2L, 20L)).toDF("o_orderkey", "o_custkey")
    val out = StageScale.widen(src, 3, Seq("o_orderkey", "o_custkey"))
    assert(out.count() == 6)
    // copy c of order 1 must reference copy c of customer 10: both
    // keys carry the same shift, so join fan-out is copy-local
    val pairs = out.select(col("o_orderkey"), col("o_custkey"))
      .as[(Long, Long)].collect().toSet
    val ks = StageScale.keyShift
    assert(pairs == Set((1L, 10L), (2L, 20L),
      (1L + ks, 10L + ks), (2L + ks, 20L + ks),
      (1L + 2 * ks, 10L + 2 * ks), (2L + 2 * ks, 20L + 2 * ks)))
  }

  test("customer names perturb per copy: copy 0 verbatim, distinct " +
    "copies >= 3 edits apart (symdelete maxDist<=2 cannot pair them)") {
    val src = Seq((7L, "Customer#000000007", 3))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val out = StageScale.widen(src, 4, Seq("c_custkey"), "customer")
      .orderBy("c_custkey").select("c_name").as[String].collect()
    assert(out(0) == "Customer#000000007") // base row is a literal subset
    assert(out.distinct.length == 4)
    // suffix = "~" + copy-digit repeated 3x: same-length suffixes of
    // distinct copies differ in all 3 positions, and vs copy 0 the
    // whole 4-char suffix is an insertion — both >= 3 edits
    assert(out(1) == "Customer#000000007~111")
    assert(out(3) == "Customer#000000007~333")
    for (i <- out.indices; j <- out.indices if i < j) {
      val dist = levenshteinDist(out(i), out(j))
      assert(dist >= 3, s"copies $i/$j only $dist edits apart")
    }
  }

  test("document text perturbs per token: copy vocabularies are " +
    "disjoint and n_chars tracks the perturbed text") {
    val src = Seq((1L, "key agg row scan", "en", "synth", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = StageScale.widen(src, 3, Seq("doc_id"), "documents")
      .orderBy("doc_id")
      .select("text", "n_chars").as[(String, Long)].collect()
    assert(out(0) == (("key agg row scan", 16L)))
    assert(out(1)._1 == "key~1 agg~1 row~1 scan~1")
    assert(out(2)._1 == "key~2 agg~2 row~2 scan~2")
    out.foreach { case (t, n) => assert(n == t.length.toLong) }
    // shingle/token overlap across any two copies is zero — a near-dup
    // query must see fresh documents, not verbatim clones
    val vocabs = out.map(_._1.split(" ").toSet)
    for (i <- vocabs.indices; j <- vocabs.indices if i < j)
      assert(vocabs(i).intersect(vocabs(j)).isEmpty)
  }

  test("multi-digit copies stay >= 3 edits apart (digit tripling, " +
    "not whole-number repetition — ADVICE r15: copy 12 '~121212' vs " +
    "copy 21 '~212121' were 2 edits apart)") {
    val src = Seq((7L, "Customer#000000007", 3))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val out = StageScale.widen(src, 23, Seq("c_custkey"), "customer")
      .orderBy("c_custkey").select("c_name").as[String].collect()
    assert(out(12) == "Customer#000000007~111222")
    assert(out(21) == "Customer#000000007~222111")
    for (i <- out.indices; j <- out.indices if i < j) {
      val dist = levenshteinDist(out(i), out(j))
      assert(dist >= 3, s"copies $i/$j only $dist edits apart")
    }
  }

  test("empty tokens from repeated/leading/trailing spaces are not " +
    "suffixed — perturbed copies keep parallel token statistics") {
    val src = Seq((1L, " key  agg ", "en", "synth", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = StageScale.widen(src, 2, Seq("doc_id"), "documents")
      .orderBy("doc_id").select("text").as[String].collect()
    assert(out(0) == " key  agg ")
    // no bare "~1" tokens minted at the empty split positions; the
    // non-empty token count matches the base copy exactly
    assert(out(1) == " key~1  agg~1 ")
    assert(out(1).split(" ").count(_.nonEmpty)
      == out(0).split(" ").count(_.nonEmpty))
  }

  test("embeddings: per-copy sign flip preserves every intra-copy " +
    "inner product exactly and decorrelates copies") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, -3.0f, 0.5f), 0),
      (2L, Array(-0.5f, 1.5f, 2.5f, -1.0f), 1),
      (3L, Array(2.0f, -1.0f, 0.0f, 4.0f), 0))
    val src = vecs.toDF("vec_id", "embedding", "label")
    val out = StageScale.widen(src, 3, Seq("vec_id"), "embeddings")
      .orderBy("vec_id")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    assert(out.length == 9)
    val ks = StageScale.keyShift
    val byCopy = out.groupBy { case (id, _) => id / ks }
      .map { case (c, rows) =>
        c -> rows.sortBy(_._1).map(_._2) }
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    // copy 0 is verbatim
    assert(byCopy(0L).zip(vecs.map(_._2)).forall {
      case (a, b) => a.sameElements(b) })
    // ORTHOGONAL-TRANSFORM invariant: every pairwise inner product
    // (and every norm) inside a copy equals the base copy's exactly —
    // sign flips multiply each term by s_d^2 = 1. Neighbor sets and
    // recall therefore cannot move (VERDICT r15 #4's requirement).
    for (c <- 1L to 2L; i <- 0 until 3; j <- 0 until 3) {
      val base = dot(byCopy(0L)(i), byCopy(0L)(j))
      val got = dot(byCopy(c)(i), byCopy(c)(j))
      assert(math.abs(got - base) < 1e-5,
        s"copy $c pair ($i,$j): $got != $base")
    }
    // copies are DECORRELATED, not clones: each copy >= 1 must differ
    // from copy 0 in at least one coordinate of at least one vector
    // (all-signs-positive for every (copy,dim) would defeat the point)
    for (c <- 1L to 2L)
      assert(byCopy(c).zip(byCopy(0L)).exists {
        case (a, b) => !a.sameElements(b) }, s"copy $c is verbatim")
    // magnitudes unchanged per element (sign flip only)
    for (c <- 1L to 2L; i <- 0 until 3; d <- 0 until 4)
      assert(math.abs(byCopy(c)(i)(d)) == math.abs(byCopy(0L)(i)(d)))
  }

  test("tables without content columns pass through unperturbed") {
    val src = Seq((1L, 3.5)).toDF("l_orderkey", "l_quantity")
    val out = StageScale.widen(src, 2, Seq("l_orderkey"))
    assert(out.select("l_quantity").as[Double].collect().toSeq
      == Seq(3.5, 3.5))
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
