package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MinHash/LSH/Jaccard near-dup semantics over tiny literal corpora. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val seeds = 0 until 8

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words appear in this one here"),
    (4L, "the quick brown fox jumps over the lazy dog")  // exact dup of 1
  ).toDF("doc_id", "text")

  test("identical docs share identical minhash signatures") {
    val sigs = Dedup.minhashSigs(docs, "doc_id", "text", 3, seeds)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sigs(1L) == sigs(4L))
    assert(sigs(1L) != sigs(3L))
  }

  test("LSH pairs up exact duplicates with est_jaccard 1.0") {
    val sigs = Dedup.minhashSigs(docs, "doc_id", "text", 3, seeds)
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 4, rowsPerBand = 2)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 4L)) == 1.0)
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  test("exact trigram jaccard for verified pairs") {
    // doc1/doc2 trigram sets: 7 shingles each, 6 shared -> 6 / 8 = 0.75
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    val pairs = Seq((1L, 2L)).toDF("doc1", "doc2")
    val j = Dedup.jaccardForPairs(pairs, sh, "doc_id").as[(Long, Long, Double)].head()
    assert(j == ((1L, 2L, 0.75)))
  }

  test("containment is per-side-normalized intersection and bounds jaccard") {
    // doc5 (a strict shingle-subset span of doc1's text) is fully contained:
    // cont1 = |∩|/|doc5 shingles| = 1.0 while jaccard stays < 1 — the
    // asymmetric signal the op exists for. Both directions ≤ 1, and each
    // containment ≥ the pair's jaccard (|∩|/|A| ≥ |∩|/|A∪B|).
    val withSub = docs.union(
      Seq((5L, "quick brown fox jumps over")).toDF("doc_id", "text"))
    val sh = Dedup.shingleTable(withSub, "doc_id", "text", 3)
    val pairs = Seq((5L, 1L), (1L, 2L)).toDF("doc1", "doc2")
    val cont = Dedup.containmentForPairs(pairs, sh, "doc_id")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(cont((5L, 1L))._1 == 1.0) // every doc5 trigram appears in doc1
    assert(cont((5L, 1L))._2 < 1.0)
    val jac = Dedup.jaccardForPairs(pairs, sh, "doc_id")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    cont.foreach { case (k, (c1, c2)) =>
      assert(c1 <= 1.0 && c2 <= 1.0)
      assert(c1 >= jac(k) && c2 >= jac(k), s"$k: ($c1,$c2) vs ${jac(k)}")
    }
  }

  test("components collapses pair chains to the min doc id") {
    // chain 1-2-3 plus isolated pair 7-8: two clusters
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc1", "doc2")
    val out = Dedup.components(pairs, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("componentsFixpoint converges chains deeper than a fixed iteration budget") {
    // a 7-vertex chain (diameter 6): fixed iters=4 CANNOT reach the far end,
    // the fixpoint loop must (checkpointEvery=2 exercises the lineage cut)
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
      .toDF("doc1", "doc2")
    val fixed = Dedup.components(chain, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(fixed(7L) != 1L) // the honest limitation of the bounded variant
    val fp = Dedup.componentsFixpoint(chain, checkpointEvery = 2)
      .as[(Long, Long)].collect().toMap
    assert(fp == (1L to 7L).map(_ -> 1L).toMap)
  }

  test("componentsTwoStar matches fixpoint labels on deep chains and random graphs") {
    // diameter-6 chain: past the fixed-iter variant's budget, converges in
    // O(log² n) two-star rounds; checkpointEvery=2 exercises the lineage cut
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
      .toDF("doc1", "doc2")
    val ts = Dedup.componentsTwoStar(chain, checkpointEvery = 2)
      .as[(Long, Long)].collect().toMap
    assert(ts == (1L to 7L).map(_ -> 1L).toMap)
    // deterministic pseudo-random graph: 40 nodes, 30 hash-derived edges,
    // reversed/duplicated pairs included — must equal the fixpoint truth
    val es = (0 until 30).map { i =>
      val a = Vectors.md5Long(s"tse|a|$i") % 40
      val b = Vectors.md5Long(s"tse|b|$i") % 40
      (a + 1, b + 1)
    }.filter { case (a, b) => a != b }
    val pairs = (es ++ es.map(_.swap)).toDF("doc1", "doc2")
    val truth = Dedup.componentsFixpoint(pairs)
      .as[(Long, Long)].collect().toMap
    val got = Dedup.componentsTwoStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == truth)
  }

  test("componentsTwoStar keeps disjoint clusters apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc1", "doc2")
    val out = Dedup.componentsTwoStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("componentsFixpoint keeps disjoint clusters apart") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc1", "doc2")
    val out = Dedup.componentsFixpoint(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("all-pairs jaccard agrees with the pairwise path and filters by threshold") {
    val all = Dedup.jaccardPairs(docs, "doc_id", "text", 3, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(all((1L, 2L)) == 0.75)
    assert(all((1L, 4L)) == 1.0)
    assert(!all.keySet.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  test("prefix-filter join is lossless: exactSimilarPairs ≡ brute force on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // Random 5-25-word docs from a 12-word vocabulary: dense enough that
    // many pairs co-shingle but few clear τ — the regime where a buggy
    // prefix length actually LOSES pairs (every kept pair also checks the
    // filter; every brute-force pair must survive it).
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val doc = Gen.choose(5, 25).flatMap(n => Gen.listOfN(n, word))
    for (trial <- 0 until 3) {
      val texts = (0 until 40).map { i =>
        val ws = doc.pureApply(Gen.Parameters.default, Seed(1000L * trial + i))
        (i.toLong, ws.mkString(" "))
      }
      val corpus = texts.toDF("doc_id", "text")
      val sh = Dedup.shingleTable(corpus, "doc_id", "text", 3)
      val got = Dedup.exactSimilarPairs(sh, "doc_id", 1, 2)
        .select("doc1", "doc2", "n_inter")
        .as[(Long, Long, Long)].collect().toSet
      // brute-force definition, same τ = 1/2, integer predicate
      val sets = texts.map { case (id, t) =>
        id -> t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      }.toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b
        ni = (sets(a) & sets(b)).size.toLong
        if 2 * ni >= (sets(a).size + sets(b).size - ni)
      } yield (a, b, ni)).toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("rowMinhashSigs ≡ grouped signatures (the streaming path computes the same values)") {
    val seeds = 0 until 8
    val grouped = Dedup.minhashSigs(docs, "doc_id", "text", 3, seeds)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val perRow = Dedup.rowMinhashSigs(docs, "text", seeds, 3)
      .select("doc_id", seeds.map(i => s"mh$i"): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(perRow == grouped)
    // a doc too short to shingle: grouped drops it, per-row keeps it with
    // null signatures (the tag-through streaming contract)
    val short = Seq((9L, "too short")).toDF("doc_id", "text")
    assert(Dedup.minhashSigs(short, "doc_id", "text", 3, seeds).count() == 0)
    val nulls = Dedup.rowMinhashSigs(short, "text", seeds, 3)
      .select("mh0").collect()
    assert(nulls.length == 1 && nulls.head.isNullAt(0))
  }

  test("simhashGrouped matches the HOF simhash bit-for-bit and unifies exact dups") {
    val grouped = Dedup.simhashGrouped(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = docs
      .select(col("doc_id"),
        TextOps.tokenHashes(TextOps.tokenSet(col("text"))).as("hashes"))
      .select(col("doc_id"), TextOps.simhashOfHashes(col("hashes"), 16).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grouped == hof) // two plans, one definition
    assert(grouped(1L) == grouped(4L)) // exact dups share the fingerprint
  }

  test("simhashHammingPairs is lossless at its radius: ≡ brute force, worst-case spread flips") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map(i => (i.toLong, rnd.nextLong() & ((1L << 60) - 1)))
    // planted near-dups of base docs 0..3 at distances 0,1,3,4 with flips
    // spread across DIFFERENT 15-bit blocks — the banding's worst case
    // (concentrated flips leave more blocks intact)
    val planted = Seq(0, 1, 3, 4).zipWithIndex.map { case (d, i) =>
      val flipped = (0 until d).foldLeft(base(i)._2)((v, j) => v ^ (1L << (j * 15 + 2)))
      (100L + i, flipped)
    }
    val sigs = (base ++ planted).toDF("doc_id", "sim")
    val got = Dedup.simhashHammingPairs(sigs, "doc_id", blocks = 4, blockBits = 15, maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    val brute = sigs.as("x").crossJoin(sigs.as("y"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).cast("long").as("h"))
      .where(col("h") <= 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.contains((0L, 100L, 0L))) // exact dup found at distance 0
    assert(got.contains((2L, 102L, 3L))) // distance 3: flips in 3 distinct blocks
    assert(!got.exists { case (a, b, _) => a == 3L && b == 103L }) // distance 4 excluded
  }

  test("prefix-filter candidates are a superset of true pairs and pruned vs all-pairs") {
    val sh = Dedup.shingleTable(docs, "doc_id", "text", 3)
    val cand = Dedup.prefixFilterPairs(sh, "doc_id", 3, 5)
      .select(col("doc1"), col("doc2"))
      .as[(Long, Long)].collect().toSet
    // true τ ≥ 0.6 pairs on the fixture: (1,2) at 0.75 and (1,4) at 1.0
    assert(Set((1L, 2L), (1L, 4L)).subsetOf(cand))
    // doc3 shares no shingle with anything — no candidate can contain it
    assert(!cand.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  test("duplicatedSpans finds maximal cross-doc spans, merges overlapping " +
    "shingles, splits on gaps, ignores unique docs") {
    // hand-traced at k=3:
    //  d1 "a b c d e f g": dup trigrams at pos 1-4 ("a b c".."d e f",
    //     shared with d2/d4) merge to ONE maximal span [1, 6]
    //  d2 "x x a b c d e y y": pos 3-5 → [3, 7]
    //  d3 unique → no rows
    //  d4 "a b c z d e f": pos {1, 5} — gap (5 > 1+3) → TWO spans
    //     [1, 3] and [5, 7]
    val d = Seq(
      (1L, "a b c d e f g"),
      (2L, "x x a b c d e y y"),
      (3L, "p q r s t u v"),
      (4L, "a b c z d e f")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(d, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 1L, 6L, 6L),
      (2L, 1L, 3L, 7L, 5L),
      (4L, 1L, 1L, 3L, 3L),
      (4L, 2L, 5L, 7L, 3L)), got)
  }

  test("duplicatedSpans ≡ brute force on random small-vocab docs " +
    "(positions, maximality, and gap splits all match)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val K = 3
    val docGen = Gen.choose(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    for (trial <- 1 to 5) {
      val docs = (0 until 8).map(i =>
        (i.toLong, docGen.pureApply(Gen.Parameters.default,
          Seed(9000L * trial + i))))
      // brute force: position p of doc d is dup-covered iff its K-gram
      // occurs in some OTHER doc; islands merge while pos <= prev + K
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      def grams(id: Long): Seq[(Int, String)] = {
        val t = toks(id)
        if (t.length < K) Seq.empty
        else (1 to t.length - K + 1).map(p =>
          p -> t.slice(p - 1, p - 1 + K).mkString(" "))
      }
      val byGram = docs.flatMap { case (id, _) =>
        grams(id).map { case (_, g) => g -> id } }
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
      val want = docs.flatMap { case (id, _) =>
        val dupPos = grams(id).collect {
          case (p, g) if (byGram(g) - id).nonEmpty => p
        }
        val islands = dupPos.foldLeft(List.empty[List[Int]]) {
          case (acc @ (cur :: rest), p) if p <= cur.head + K =>
            (p :: cur) :: rest
          case (acc, p) => List(p) :: acc
        }.reverse
        islands.zipWithIndex.map { case (ps, i) =>
          (id, (i + 1).toLong, ps.min.toLong,
            ps.max.toLong + (K - 1), (ps.max + K - ps.min).toLong)
        }
      }.toSet
      val got = Dedup.duplicatedSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", K)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == want, s"trial $trial: docs=$docs")
    }
  }

  test("scrubSpans keeps the global-min occurrence intact and cuts every " +
    "other duplicated span's tokens") {
    // same fixture as the span trace: d1 owns every keeper (its occs are
    // all (doc,pos)-minimal), so d1 survives verbatim; d2 loses tokens
    // 3-7 ("a b c d e"); d4 loses both spans leaving just "z"; unique d3
    // is untouched
    def m(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d = Seq(
      (1L, "a b c d e f g"),
      (2L, "x x a b c d e y y"),
      (3L, "p q r s t u v"),
      (4L, "a b c z d e f")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubSpans(d, "doc_id", "text", 3)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 7L, m("a b c d e f g")),
      (2L, 4L, m("x x y y")),
      (3L, 7L, m("p q r s t u v")),
      (4L, 1L, m("z"))), got)
  }
}
