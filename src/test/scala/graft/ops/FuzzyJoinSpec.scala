package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy join: the load-bearing claim is
  * LOSSLESSNESS at radius 1 — every edit-distance-1 pair shares a
  * deletion variant, so the candidate screen has zero false negatives and
  * the verified output equals the brute-force definition.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants emits the word plus each one-char deletion, deduped") {
    val out = Seq("abc").toDF("w")
      .select(FuzzyJoin.deletionVariants(col("w")).as("v"))
      .as[Seq[String]].head()
    assert(out.toSet == Set("abc", "bc", "ac", "ab"))
    // runs of equal chars collapse to one variant
    val aa = Seq("aab").toDF("w")
      .select(FuzzyJoin.deletionVariants(col("w")).as("v"))
      .as[Seq[String]].head()
    assert(aa.toSet == Set("aab", "ab", "aa"))
  }

  test("editDistance1Pairs ≡ brute-force levenshtein join on random keys " +
    "(substitution, deletion, insertion all captured)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val word = Gen.choose(3, 7)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (trial <- 0 until 3) {
      val keys = (0 until 60)
        .map(i => word.pureApply(Gen.Parameters.default, Seed(500L * trial + i)))
        .distinct
      val df = keys.toDF("k")
      val got = FuzzyJoin.editDistance1Pairs(df, "k")
        .as[(String, String, Long)].collect().toSet
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = (for {
        a <- keys; b <- keys if a < b && lev(a, b) <= 1
      } yield (a, b, lev(a, b).toLong)).toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("empty-string keys join their 1-char neighbours and emit no " +
    "spurious variants") {
    // "" is at distance 1 from every single-char key (insertion); the
    // unguarded deletionsOnly used to expand sequence(1, 0) → [1, 0] and
    // emit two ""-variants with bogus positions (harmless but unscreened).
    val df = Seq("", "a", "b", "ab").toDF("k")
    val got = FuzzyJoin.editDistance1Pairs(df, "k")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("", "a", 1L), ("", "b", 1L), ("a", "ab", 1L),
      ("ab", "b", 1L), ("a", "b", 1L)), got)
  }
}
