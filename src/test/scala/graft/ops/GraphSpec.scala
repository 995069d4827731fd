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

  test("invertClosure turns ancestors into descendants") {
    val df = Seq(("x", Seq("x", "p")), ("y", Seq("y", "p"))).toDF("id", "ancestors")
    val inv = Graph.invertClosure(df, "id", "ancestors")
      .as[(String, Seq[String])].collect().toMap
    assert(inv("p") == Seq("x", "y"))
    assert(inv("x") == Seq("x"))
    assert(inv("y") == Seq("y"))
  }
}
