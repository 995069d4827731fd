package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Relational graph encoding: undirected-ification (sc:53-54), adjacency LUT
  * (sc:72-74), reflexive 1-hop (sc:450/464), ontology inversion (sc:178-184).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("undirect unions reversed pairs and dedupes") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c")).toDF("src", "dst")
    val und = Graph.undirect(edges).as[(String, String)].collect().toSet
    assert(und == Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")))
  }

  test("undirect is idempotent") {
    val edges = Seq(("a", "b"), ("c", "a")).toDF("src", "dst")
    val once = Graph.undirect(edges)
    assert(Graph.undirect(once).count() == once.count())
  }

  test("adjacency collapses to sorted neighbour arrays with exact degree") {
    val edges = Graph.undirect(Seq(("a", "b"), ("b", "c")).toDF("src", "dst"))
    val adj = Graph.adjacency(edges)
      .select(col("src"), col("neighbours"), col("degree"))
      .as[(String, Seq[String], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(adj("a") == ((Seq("b"), 1L)))
    assert(adj("b") == ((Seq("a", "c"), 2L)))
    assert(adj("c") == ((Seq("b"), 1L)))
  }

  test("reflexive one-hop fans out to self plus neighbours") {
    val adj = Graph.adjacency(Graph.undirect(Seq(("a", "b")).toDF("src", "dst")))
    val hops = Graph.oneHopReflexive(adj).as[(String, String)].collect().toSet
    assert(hops == Set(("a", "b"), ("a", "a"), ("b", "a"), ("b", "b")))
  }

  test("triangles counts each triangle exactly once via degree orientation") {
    // K4 (4 triangles) ∪ 4-cycle e-f-g-h (0) ∪ triangle i-j-k with pendant (1)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L),                     // square
      (9L, 10L), (10L, 11L), (9L, 11L), (11L, 12L)                // tri + tail
    ).toDF("src", "dst")
    assert(Graph.triangles(edges).as[Long].head() == 5L)
    assert(Graph.triangles(Seq((1L, 2L)).toDF("src", "dst")).as[Long].head() == 0L)
  }

  test("pagerankFixed: symmetry, hub dominance, mass conservation") {
    // star: center 1 <-> leaves 2,3,4 (undirected so out-degree >= 1)
    val star = Graph.undirect(
      Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst"))
    val pr = Graph.pagerankFixed(star, iters = 3)
      .as[(Long, Long)].collect().toMap
    // leaves are mutually symmetric — identical graphs must give
    // identical integer scores, with NO fp tolerance
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L), pr)
    assert(pr(1L) > pr(2L), s"hub must outrank leaves: $pr")
    // total mass <= 1e9, deficit only from floor losses: each of the
    // 4 nodes loses < 1 billionth per DIV, 3 DIV sites, 3 iterations
    val mass = pr.values.sum
    assert(mass <= 1000000000L && mass > 1000000000L - 4 * 3 * 3 - 4, mass)
  }

  test("pagerankFixed is partitioning-invariant: identical integer scores " +
    "under different physical layouts") {
    val edges = Graph.undirect(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 1L)
    ).toDF("src", "dst"))
    def run(parts: Int): Map[Long, Long] =
      Graph.pagerankFixed(edges.repartition(parts), iters = 3)
        .as[(Long, Long)].collect().toMap
    // the fixed-point claim with teeth: ANY partitioning (and so any
    // summation order) must produce bit-identical integer scores
    assert(run(1) == run(7))
  }

  test("pagerankFixed: 2-cycle is the uniform fixed point") {
    val two = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = Graph.pagerankFixed(two, iters = 5)
      .as[(Long, Long)].collect().toMap
    // each node has degree 1 and receives the other's full (damped)
    // score: base + 0.85 * s0 = 1e9/2*0.15/... = 75e6 + 425e6 = s0 —
    // the uniform distribution is exactly preserved, no drift ever
    assert(pr(1L) == pr(2L), pr)
    assert(pr(1L) == 500000000L, pr)
  }

  test("kcoreRounds cascades: peeling a leaf exposes its neighbour") {
    // K4 on {1,2,3,4} + path 1-5, 5-6. Mean degree = 16/6 -> k=2.
    // Round 1 peels 6 (deg 1); round 2 peels 5 (its degree FELL to 1 when
    // 6 left — the cascade); round 3 is the fixed point (the 4-clique).
    val edges = Graph.undirect(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (1L, 5L), (5L, 6L)).toDF("src", "dst"))
    val rows = Graph.kcoreRounds(edges, rounds = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 2L, 5L, 14L), (2L, 2L, 4L, 12L),
      (3L, 2L, 4L, 12L)))
  }

  test("kcoreRounds fixed point: a cycle at k = mean degree peels nothing") {
    val n = 5L
    val edges = Graph.undirect(
      (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst"))
    val rows = Graph.kcoreRounds(edges, rounds = 3)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, 2L, 5L, 10L), (2L, 2L, 5L, 10L),
      (3L, 2L, 5L, 10L)))
  }

  test("bfsRounds labels first-seen distance and stops at the round bound") {
    // path 1-2-3-4-5 plus a shortcut 1-3: node 3 must get dist 1 via the
    // shortcut (first seen wins), node 4 dist 2, node 5 dist 3; nothing
    // beyond round 3 — and the seed is min(node) = 1.
    val edges = Graph.undirect(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
        .toDF("src", "dst"))
    val d = Graph.bfsRounds(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("labelPropagation: two cliques joined by one bridge resolve to " +
    "two 3-member communities") {
    // cliques {1,2,3} and {10,11,12} with bridge 3-10. Hand-traced
    // synchronous min-tie vote: round 1 gives the second clique's hub
    // node 10 the bridge label 3 (its smallest neighbour), and rounds
    // 2-3 spread 3 through {10,11,12} while {1,2,3} settles on 1 — the
    // bridge leaks a LABEL across, but the communities stay separate
    // (what LPA promises); the leaked label id is why community ids are
    // representatives, not canonical minima.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val edges = Graph.undirect(tri.toDF("src", "dst"))
    val got = Graph.labelPropagation(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 3L -> 3L),
      s"expected two 3-member communities labeled 1 and 3, got $got")
  }

  test("invertClosure turns ancestors into descendants") {
    val df = Seq(("x", Seq("x", "p")), ("y", Seq("y", "p"))).toDF("id", "ancestors")
    val inv = Graph.invertClosure(df, "id", "ancestors")
      .as[(String, Seq[String])].collect().toMap
    assert(inv("p") == Seq("x", "y"))
    assert(inv("x") == Seq("x"))
    assert(inv("y") == Seq("y"))
  }
}
