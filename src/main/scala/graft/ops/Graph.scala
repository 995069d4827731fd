package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph ops: the reference models its PPI network as an edge-list
  * DataFrame undirected via union+distinct (sc:53-54) and collapsed to an
  * adjacency-list lookup table via groupBy+collect_set (sc:72-74); 1-hop
  * propagation is explode(neighbours)+join (sc:146-147, 450, 464).
  *
  * We keep exactly that relational encoding — for 1-hop semantics a graph
  * engine buys nothing, and edge tables shuffle/partition like any other
  * relation at 100 TB (hash-partition on the source vertex).
  */
object Graph {

  /** Undirect a directed edge list: union the reversed pairs, dedupe.
    * Columns must be (src, dst). One shuffle (the distinct).
    */
  def undirect(edges: DataFrame): DataFrame = {
    val Array(a, b) = edges.columns
    edges.union(edges.select(col(b).as(a), col(a).as(b))).distinct()
  }

  /** Adjacency-list LUT: (src, neighbours sorted, degree exact).
    * Reference kept neighbours exact but degree approximate (HLL++, sc:73-74);
    * we expose both — `degree` exact (consistent with the array) and
    * `degree_approx` for the HLL++ capability.
    */
  def adjacency(edges: DataFrame): DataFrame = {
    val Array(a, b) = edges.columns
    edges
      .groupBy(col(a).as("src"))
      .agg(
        sort_array(collect_set(col(b))).as("neighbours"),
        approx_count_distinct(col(b)).as("degree_approx")
      )
      .withColumn("degree", size(col("neighbours")).cast("long"))
  }

  /** Reflexive 1-hop expansion: each src row fans out to itself plus every
    * neighbour (array_union(neighbours,[self]) → explode; sc:450, 464).
    * Output: (src, hop).
    */
  def oneHopReflexive(adjacencyLut: DataFrame): DataFrame =
    adjacencyLut
      .select(col("src"), explode(array_union(col("neighbours"), array(col("src")))).as("hop"))

  /** Invert a node→ancestors array table into ancestor→descendants
    * (ontology inversion, sc:178-184): explode, swap, re-collect.
    */
  def invertClosure(df: DataFrame, id: String, ancestors: String): DataFrame =
    df.select(col(id), explode(col(ancestors)).as("ancestor"))
      .groupBy(col("ancestor"))
      .agg(sort_array(collect_set(col(id))).as("descendants"))

  /** Triangle count via degree-ordered orientation (the cluster-scale
    * algorithm): each undirected edge points from its (degree, id)-smaller
    * endpoint to the larger, which makes the orientation acyclic and bounds
    * every out-degree by O(√m) — so the wedge join (e1.t = e2.s) can't blow
    * up on hub vertices the way an unoriented join would. Each triangle has
    * exactly one wedge whose closing edge exists in the oriented set, so the
    * final count needs no /3 or dedup. Input: (src, dst) distinct undirected
    * edges (one row per edge, no self-loops). Output: one row, n_triangles.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val Array(a, b) = edges.columns
    val e = edges.select(col(a).as("src"), col(b).as("dst"))
    val deg = e.select(col("src").as("u")).union(e.select(col("dst").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("u").as("src"), col("d").as("ds")), Seq("src"))
      .join(deg.select(col("u").as("dst"), col("d").as("dt")), Seq("dst"))
    val srcFirst = struct(col("ds"), col("src")) < struct(col("dt"), col("dst"))
    // 3 wedge-join consumers: without the persist each reference re-derives
    // the whole orientation lineage (dedup + degree joins) at runtime —
    // A/B Smoke ×3 warm sf0.1: 2.4-2.9 s bare vs 1.2-1.5 s persisted
    val oriented = withDeg.select(
      when(srcFirst, col("src")).otherwise(col("dst")).as("s"),
      when(srcFirst, col("dst")).otherwise(col("src")).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    oriented.as("e1")
      .join(oriented.as("e2"), col("e1.t") === col("e2.s"))
      .join(oriented.as("e3"),
        col("e3.s") === col("e1.s") && col("e3.t") === col("e2.t"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-round label propagation (Raghavan et al. 2007) — community
    * detection by iterated neighbour-majority vote: every node starts as
    * its own label; each round it adopts the most frequent label among its
    * neighbours, ties broken toward the SMALLEST label so every round is a
    * deterministic function of the graph (classic LPA's random order makes
    * runs non-comparable; this synchronous min-tie variant is exactly
    * reproducible and SQL-expressible). Input: (src, dst) undirected (both
    * directions present). Output: one row per surviving community —
    * (community, n_members) with community = the adopted label.
    *
    * Scale shape: the canonical iterative join+agg, same discipline as
    * pagerankFixed — the edge table caches hash-partitioned on the join
    * key ONCE, each round shuffles only the node-sized label frame; the
    * per-round vote is count + row_number over the (node × neighbour-label)
    * frame, bounded by the edge count. All-integer state, no FP anywhere.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val Array(a, b) = edges.columns
    // repartition on the join key BEFORE materializing (r6 pagerank
    // lesson): the label join reads e by d every round; the upstream
    // layout would re-shuffle the edge side per iteration.
    // localCheckpoint, not persist (r16, the kcore finding): every
    // round's plan otherwise re-ANALYZES the full upstream co-occurrence
    // lineage through the cached-but-deep frame — the per-round join is
    // now a shallow LogicalRDD scan.
    val e = edges.select(col(a).as("s"), col(b).as("d"))
      .repartition(col("d"))
      .localCheckpoint()
    var labels = e.select(col("s").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    (1 to rounds).foreach { _ =>
      val w = Window.partitionBy(col("node"))
        .orderBy(col("c").desc, col("lbl"))
      labels = e
        .join(labels.select(col("node").as("d"), col("lbl")), Seq("d"))
        .groupBy(col("s"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .select(col("s").as("node"), col("lbl"), col("c"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("node"), col("lbl"))
    }
    val out = labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"))
    out.localCheckpoint()
  }

  /** Fixed-point PageRank (damping 0.85, scores in billionths): every
    * intermediate is an exact integer (DIV floor division), so the result
    * is identical under ANY partitioning or summation order — a
    * double-valued PageRank can never be cross-engine hash-exact because
    * per-node contribution sums land in different orders. Caller must
    * ensure every node has out-degree >= 1 (e.g. by undirecting — no
    * dangling-mass term here). Input: (src, dst) distinct edges. Output:
    * (node, pr_fixed), Σ pr_fixed <= 1e9 with a bounded floor-loss deficit.
    *
    * Scale shape: the canonical iterative join+agg — edges cached
    * hash-partitioned once, each iteration shuffles the node-count score
    * frame (map-side partial sum), constants ride a 1-row broadcast
    * (derived columns computed INSIDE the 1-row frame before the join).
    */
  def pagerankFixed(edges: DataFrame, iters: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val Array(a, b) = edges.columns
    // repartition on src BEFORE materializing: upstream ops (distinct)
    // leave the frame partitioned by (src, dst), and that layout forces a
    // fresh edge-side exchange in EVERY iteration's join — pre-hashing on
    // the join key makes the per-iteration shuffle the score frame only.
    // localCheckpoint, not persist (r16, the kcore finding): each
    // iteration otherwise re-analyzes the whole upstream edge lineage.
    val e = edges.select(col(a).as("src"), col(b).as("dst"))
      .repartition(col("src"))
      .localCheckpoint()
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val consts = deg.agg(count(lit(1)).as("n"))
      .select(expr("CAST(150000000 DIV n AS BIGINT)").as("base"),
        expr("CAST(1000000000 DIV n AS BIGINT)").as("s0"))
    val degc = deg.crossJoin(broadcast(consts))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var score = degc
      .select(col("node"), col("deg"), col("base"), col("s0").as("score"))
    for (_ <- 1 to iters) {
      val m = score.join(e, score("node") === e("src"))
        .select(col("dst").as("node"), expr("score DIV deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("m"))
      score = m.join(degc, Seq("node"))
        .select(col("node"), col("deg"), col("base"),
          (col("base") + expr("85 * m DIV 100")).as("score"))
    }
    score.select(col("node"), col("score").as("pr_fixed"))
  }

  /** Fixed-round k-core peeling (Seidman '83) with a scale-adaptive
    * threshold k = floor(mean degree) = |directed edges| DIV |nodes|:
    * each round recomputes degrees over the surviving edge set and deletes
    * every node below k together with its incident edges — the cascade
    * that defines the core (a node can start above k and fall below it as
    * its neighbours peel). Emits one summary row per round
    * (round, k, n_alive, n_edges) so the result stays informative even
    * when the core empties. The fixed round count keeps the plan static
    * and the cross-engine oracle an unrolled CTE (pagerankFixed's trick);
    * k rides exact integer division, so every output cell is an integer
    * and the compare tolerates no FP slack.
    *
    * Input must already be undirected (both directions present).
    *
    * 100 TB shape: per round one keyed degree count (map-side partial)
    * plus two broadcast semi-joins against the shrinking alive set —
    * edges are hash-partitioned on src ONCE before the round-0 persist,
    * and broadcast semi-joins preserve that layout, so no round
    * re-shuffles the big side; each round's surviving frame persists in
    * the same layout for its two consumers (next round's degree agg and
    * its own summary count).
    */
  /** One peel round at threshold `k` (a driver literal — kcoreRounds
    * collects it once): (alive nodes, surviving edges). The surviving-edge
    * frame meets the shrinking alive set as two broadcast semi-joins on
    * the edges' existing layout — exposed so plan pins can assert that
    * strategy directly (the round loop below is eager, so the plan of its
    * RESULT is a LocalRelation of collected summary rows).
    */
  def kcorePeel(edges: DataFrame, k: Long): (DataFrame, DataFrame) = {
    val alive = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .where(col("deg") >= k)
      .select(col("src").as("node"))
    val next = edges
      .join(broadcast(alive.select(col("node").as("src"))),
        Seq("src"), "left_semi")
      .join(broadcast(alive.select(col("node").as("dst"))),
        Seq("dst"), "left_semi")
    (alive, next)
  }

  def kcoreRounds(undirected: DataFrame, rounds: Int): DataFrame = {
    val spark = undirected.sparkSession
    import spark.implicits._
    // Eager checkpoint of the edge set FIRST (r16 — the two-star rule's
    // kcore instance): each round references its edge generation 3×
    // (degree agg + two semi-join broadcast builds), so the old
    // persist-only chain re-ANALYZED the whole upstream lineage (the
    // events co-occurrence self-join) 3^r-fold every round — measured
    // 5.0 s wall whose 39 job MS summed to 2.1 s: ~2.9 s was pure
    // between-job planning. A localCheckpoint per generation keeps every
    // round's plan a shallow LogicalRDD scan; old generations release on
    // GC (ContextCleaner), and at most two are referenced at once.
    var edges = undirected.repartition(col("src")).localCheckpoint()
    // k is ONE scalar for the whole peel: collect it once — lit(k)
    // replaces the persisted 1-row kf frame and the two broadcast
    // crossJoins per round the old shape paid to read it.
    val k = edges
      .agg(count(lit(1)).as("m"), countDistinct(col("src")).as("nv"))
      .select(expr("CAST(m DIV nv AS BIGINT)").as("k")).head().getLong(0)
    // Eager rounds: the summary counts collect as scalars per round (the
    // nndConverge pattern), so the output frame is a LocalRelation — no
    // per-round 1-row checkpoints, no final union of checkpointed frames.
    val rows = (1 to rounds).map { r =>
      val (alive, nextRaw) = kcorePeel(edges, k)
      val nAlive = alive.count()
      val next = nextRaw.localCheckpoint()
      val nEdges = next.count()
      edges = next
      (r.toLong, k, nAlive, nEdges)
    }
    rows.toDF("round", "k", "n_alive", "n_edges")
  }

  /** Fixed-round BFS from a deterministic seed (the minimum node id):
    * round r labels every unreached neighbour of the round-(r-1) frontier
    * with distance r. Integer distances, deterministic seed, static plan —
    * the oracle unrolls the same rounds (min-distance semantics fall out
    * of the anti-join: a node is labelled the FIRST round it is seen).
    *
    * 100 TB shape: classic frontier expansion — edges hash-partitioned on
    * src once and persisted; each round joins the (small) frontier against
    * the edge cache as a broadcast, then anti-joins the (node-sized)
    * visited set, also broadcast while the reachable set is sparse. The
    * per-round shuffle is frontier-sized, never edge-sized.
    *
    * Input: undirected edge MULTISET (both directions present; duplicate
    * edges allowed) — dedup happens HERE, after the src repartition,
    * because hash(src) satisfies the distinct's
    * ClusteredDistribution(src, dst): one fused shuffle instead of the
    * two a caller-side distinct-then-repartition pays.
    */
  def bfsRounds(undirected: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // localCheckpoint, not persist (r16, the kcore finding): each round's
    // frontier expansion otherwise re-analyzes the whole upstream edge
    // lineage through the cached-but-deep frame.
    val e = undirected.repartition(col("src")).distinct()
      .localCheckpoint()
    val seed = e.agg(min(col("src")).as("node"))
      .select(col("node"), lit(0L).as("dist"))
    // Chunked materialization (r8 bench lesson): an eager action EVERY
    // round costs ~1 job of overhead per round (the per-round
    // grown.count() shape measured 5.2× in BENCH_r08), while a fully lazy
    // loop pins every per-round persist for the life of the session and
    // doubles the logical plan each round (next_r references frontier_{r-1}
    // twice — once directly, once inside visited). Compromise: persist the
    // frontier-sized `next` lazily within a chunk and localCheckpoint the
    // visited union once every CHUNK rounds — ONE job materializes the
    // whole chunk (intra-chunk persists make each round's frontier compute
    // once inside that job), then the chunk's caches release. Plan growth
    // is bounded by 2^CHUNK between truncations; at most one chunk of
    // node-sized frames is ever live; nothing outlives the call. A 3-round
    // BFS thus runs in 2 jobs (seed-min + final checkpoint), the r7 floor.
    val CHUNK = 4
    import scala.collection.mutable.ArrayBuffer
    val pending = ArrayBuffer.empty[DataFrame]
    var visited = seed.persist(StorageLevel.MEMORY_AND_DISK)
    pending += visited
    var frontier = visited
    for (r <- 1 to rounds) {
      val next = e.join(broadcast(frontier.select(col("node").as("src"))),
          Seq("src"), "left_semi")
        .select(col("dst").as("node"))
        // anti BEFORE distinct: in late rounds most candidate dsts are
        // already visited, so the broadcast anti-join shrinks the distinct
        // shuffle's input from edge-sized to frontier-sized
        .join(broadcast(visited.select(col("node"))), Seq("node"), "left_anti")
        .distinct()
        .select(col("node"), lit(r.toLong).as("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      pending += next
      visited = visited.unionByName(next)
      frontier = next
      if (r % CHUNK == 0 && r < rounds) {
        visited = visited.localCheckpoint() // one job per chunk
        pending.foreach(_.unpersist(blocking = false))
        pending.clear()
        frontier = visited.where(col("dist") === lit(r.toLong))
      }
    }
    val out = visited.localCheckpoint()
    pending.foreach(_.unpersist(blocking = false))
    out
  }
}
