package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted kNN-graph store and its incremental-maintenance theorem
  * (KnnStore's class doc): `build(base)` + `addArrivals(batch)` must leave
  * all five tables row-identical to `build(base ∪ batch)` under the same
  * centroid frame — exact, because the probe-2 candidate relation
  * decomposes disjointly over the split and bounded top-K is mergeable.
  * Plus the storage discipline: an arrival batch rewrites ONLY the
  * partitions it touches (every other cell directory stays byte-stable).
  */
class KnnStoreSpec extends SparkSpec {
  private val dir =
    sys.env.getOrElse("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")
  private val K = 3

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-knnstore-$tag").toString

  private lazy val corpus = SimSearch.embeds(spark, dir).cache()
  private lazy val cents = {
    val n = corpus.count()
    SimSearch.trainedCentroidFrame(corpus, n).localCheckpoint(true)
  }
  // tiny disjoint arrival batch (hash-picked ~1/256 — NEVER an id prefix)
  private def isArrival = pmod(xxhash64(concat(lit("knnstore|"),
    col("vec_id").cast("string"))), lit(256L)) === 0
  private lazy val arrivals = corpus.where(isArrival).localCheckpoint(true)
  private lazy val base = corpus.where(!isArrival).localCheckpoint(true)

  private def graphSet(df: DataFrame) =
    df.select(col("vec_id"), col("rank"), col("nbr"), col("cos"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
  private def memberSet(df: DataFrame) =
    df.select(col("vec_id"), col("bucket"),
        coalesce(col("bucket2"), lit(-1L)), col("vn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Double](3))).toSet
  private def postingSet(df: DataFrame) =
    df.select(col("vec_id"), col("pcell"), col("home"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  private def dirSet(df: DataFrame) =
    df.select(col("vec_id"), col("home"),
        coalesce(col("bucket2"), lit(-1L)), col("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
  private def adjSet(df: DataFrame) =
    df.select(col("v"), col("u"), col("owner"), col("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
  private def allTablesEqual(rootA: String, rootB: String): Unit = {
    assert(graphSet(KnnStore.readGraph(spark, rootA)) ==
      graphSet(KnnStore.readGraph(spark, rootB)))
    assert(memberSet(KnnStore.readMembers(spark, rootA)) ==
      memberSet(KnnStore.readMembers(spark, rootB)))
    assert(postingSet(KnnStore.readPostings(spark, rootA)) ==
      postingSet(KnnStore.readPostings(spark, rootB)))
    assert(dirSet(KnnStore.readDir(spark, rootA)) ==
      dirSet(KnnStore.readDir(spark, rootB)))
    assert(adjSet(KnnStore.readAdj(spark, rootA)) ==
      adjSet(KnnStore.readAdj(spark, rootB)))
    // set-equality can hide duplicated rows; adj rows are unique by
    // construction, so the counts must agree too
    assert(KnnStore.readAdj(spark, rootA).count() ==
      KnnStore.readAdj(spark, rootB).count())
  }

  // full-corpus build — shared by the identity and rebuild-equivalence
  // tests
  private lazy val fullRoot = {
    val root = tmpRoot("full")
    KnnStore.build(spark, corpus, cents, root, K)
    root
  }

  test("build reproduces the registered probe-2 graph row-for-row under " +
    "the same centroid frame") {
    val stored = graphSet(KnnStore.readGraph(spark, fullRoot))
    val reg = graphSet(
      SimSearch.queries("q_sim_knn_graph_trained2")(spark, dir))
    assert(stored == reg)
    assert(stored.nonEmpty)
  }

  test("adj is exactly the undirected, owner-tagged view of graph — both " +
    "directions of every edge, sharded by hash(v) % the persisted " +
    "layout constant") {
    val shards = KnnStore.readDirShards(spark, fullRoot)
    val g = KnnStore.readGraph(spark, fullRoot)
      .select(col("vec_id"), col("nbr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = g.flatMap { case (x, y) =>
      Seq((x, y, x, KnnStore.shardOfId(x, shards)),
        (y, x, x, KnnStore.shardOfId(y, shards)))
    }.toSet
    val got = adjSet(KnnStore.readAdj(spark, fullRoot))
    assert(got == expected)
    assert(KnnStore.readAdj(spark, fullRoot).count() == 2L * g.length)
  }

  test("incremental maintenance is exact: build(base) + addArrivals ≡ " +
    "build(base ∪ arrivals), all five tables") {
    assert(arrivals.count() > 0, "hash split produced no arrivals")
    val incRoot = tmpRoot("inc")
    KnnStore.build(spark, base, cents, incRoot, K)
    KnnStore.addArrivals(spark, arrivals, cents, incRoot, K)
    allTablesEqual(incRoot, fullRoot)
  }

  test("incremental maintenance composes over time: two successive " +
    "arrival batches ≡ one rebuild over everything") {
    // split the arrivals themselves in two by hash — batches arrive in
    // sequence, each folding into the store the previous one left
    val h2 = pmod(xxhash64(concat(lit("knnstore2|"),
      col("vec_id").cast("string"))), lit(2L)) === 0
    val batch1 = arrivals.where(h2)
    val batch2 = arrivals.where(!h2)
    assert(batch1.count() > 0 && batch2.count() > 0,
      "second-level hash split left a batch empty")
    val root = tmpRoot("seq")
    KnnStore.build(spark, base, cents, root, K)
    KnnStore.addArrivals(spark, batch1, cents, root, K)
    KnnStore.addArrivals(spark, batch2, cents, root, K)
    allTablesEqual(root, fullRoot)
  }

  test("an empty arrival batch is a no-op: every table byte-identical") {
    val root = tmpRoot("empty")
    KnnStore.build(spark, corpus, cents, root, K)
    val g0 = graphSet(KnnStore.readGraph(spark, root))
    val m0 = memberSet(KnnStore.readMembers(spark, root))
    val p0 = postingSet(KnnStore.readPostings(spark, root))
    val d0 = dirSet(KnnStore.readDir(spark, root))
    KnnStore.addArrivals(spark, corpus.where(lit(false)), cents, root, K)
    assert(graphSet(KnnStore.readGraph(spark, root)) == g0)
    assert(memberSet(KnnStore.readMembers(spark, root)) == m0)
    assert(postingSet(KnnStore.readPostings(spark, root)) == p0)
    assert(dirSet(KnnStore.readDir(spark, root)) == d0)
  }

  test("build into a non-empty root starts from scratch: no ghost " +
    "partitions from a previous store survive (r13 ADVICE)") {
    val root = tmpRoot("dirty")
    // a previous, LARGER store at the same root — its extra cell
    // partitions must not leak into the rebuild
    KnnStore.build(spark, corpus, cents, root, K)
    KnnStore.build(spark, base, cents, root, K)
    val baseRoot = tmpRoot("cleanbase")
    KnnStore.build(spark, base, cents, baseRoot, K)
    allTablesEqual(root, baseRoot)
  }

  test("removal is exact: build(corpus) + removeVectors(arrival ids) ≡ " +
    "build(base), all five tables") {
    val root = tmpRoot("rm")
    KnnStore.build(spark, corpus, cents, root, K)
    KnnStore.removeVectors(spark, arrivals.select(col("vec_id")), root, K)
    val expRoot = tmpRoot("rmexp")
    KnnStore.build(spark, base, cents, expRoot, K)
    allTablesEqual(root, expRoot)
  }

  test("removing every member of a cell DELETES the emptied partitions — " +
    "no ghost rows survive dynamic overwrite") {
    val root = tmpRoot("rmcell")
    KnnStore.build(spark, corpus, cents, root, K)
    val cell = KnnStore.readMembers(spark, root)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("n"), col("bucket")).head().getLong(0)
    val cellIds = KnnStore.readMembers(spark, root)
      .where(col("bucket") === cell).select(col("vec_id"))
      .localCheckpoint(true)
    KnnStore.removeVectors(spark, cellIds, root, K)
    assert(!new java.io.File(s"$root/members/bucket=$cell").exists(),
      "emptied member partition directory still on disk")
    val expRoot = tmpRoot("rmcellexp")
    KnnStore.build(spark,
      corpus.join(cellIds, Seq("vec_id"), "left_anti"), cents, expRoot, K)
    allTablesEqual(root, expRoot)
  }

  test("upsert (re-embed) is exact: build(corpus) + upsert(modified " +
    "batch) ≡ build(base ∪ modified)") {
    val root = tmpRoot("upsert")
    KnnStore.build(spark, corpus, cents, root, K)
    val updated = arrivals.select(col("vec_id"),
      transform(col("v"), x => -x).as("v")).localCheckpoint(true)
    KnnStore.upsert(spark, updated, cents, root, K)
    val expRoot = tmpRoot("upsertexp")
    KnnStore.build(spark, base.union(updated), cents, expRoot, K)
    allTablesEqual(root, expRoot)
  }

  test("fused upsert ≡ the remove ∘ add composition it replaced, all " +
    "five tables (and its guards fail loudly)") {
    val updated = arrivals.select(col("vec_id"),
      transform(col("v"), x => -x).as("v")).localCheckpoint(true)
    val root = tmpRoot("upsfused")
    KnnStore.build(spark, corpus, cents, root, K)
    KnnStore.upsert(spark, updated, cents, root, K)
    val seqRoot = tmpRoot("upsseq")
    KnnStore.build(spark, corpus, cents, seqRoot, K)
    KnnStore.upsertSequential(spark, updated, cents, seqRoot, K)
    allTablesEqual(root, seqRoot)
    // guards: in-batch duplicate; an id the store has never seen
    val one = updated.limit(1)
    val e1 = intercept[IllegalArgumentException] {
      KnnStore.upsert(spark, one.union(one), cents, root, K)
    }
    assert(e1.getMessage.contains("duplicate"))
    val alien = updated.limit(1)
      .select((col("vec_id") + lit(1L << 60)).as("vec_id"), col("v"))
    val e2 = intercept[IllegalArgumentException] {
      KnnStore.upsert(spark, alien, cents, root, K)
    }
    assert(e2.getMessage.contains("not in the store"))
  }

  test("occupancyAudit reports the members table's true cell histogram " +
    "figures and tracks an arrival batch") {
    val root = tmpRoot("audit")
    KnnStore.build(spark, base, cents, root, K)
    def auditRow = KnnStore.occupancyAudit(spark, root).head()
    val counts = KnnStore.readMembers(spark, root)
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    val r0 = auditRow
    assert(r0.getLong(0) == counts.length)            // n_cells
    assert(r0.getLong(1) == counts.sum)               // n_members
    assert(r0.getLong(2) == counts.map(c => c * c).sum) // sum_sq
    assert(r0.getLong(3) == counts.max)               // max_cell
    KnnStore.addArrivals(spark, arrivals, cents, root, K)
    assert(auditRow.getLong(1) == r0.getLong(1) + arrivals.count())
  }

  test("removal guards fail loudly: duplicate ids and non-stored ids " +
    "both throw") {
    val root = tmpRoot("rmguard")
    KnnStore.build(spark, base, cents, root, K)
    val one = base.select(col("vec_id")).limit(1)
    val e1 = intercept[IllegalArgumentException] {
      KnnStore.removeVectors(spark, one.union(one), root, K)
    }
    assert(e1.getMessage.contains("duplicate"))
    val e2 = intercept[IllegalArgumentException] {
      KnnStore.removeVectors(spark, arrivals.select(col("vec_id")), root, K)
    }
    assert(e2.getMessage.contains("not in the store"))
  }

  test("arrival-batch contract guards fail loudly: an in-batch duplicate " +
    "and a replayed (already-stored) batch both throw") {
    val root = tmpRoot("guard")
    KnnStore.build(spark, base, cents, root, K)
    val dup = arrivals.union(arrivals.limit(1))
    val e1 = intercept[IllegalArgumentException] {
      KnnStore.addArrivals(spark, dup, cents, root, K)
    }
    assert(e1.getMessage.contains("duplicate vec_ids"))
    KnnStore.addArrivals(spark, arrivals, cents, root, K)
    val e2 = intercept[IllegalArgumentException] {
      KnnStore.addArrivals(spark, arrivals, cents, root, K)
    }
    assert(e2.getMessage.contains("already exist"))
  }

  test("beam seed contract under churn: after removeVectors, a stale " +
    "seed set walks exactly as its surviving subset, and removed ids " +
    "are never served") {
    // the r14 verdict task-7 pin: beamSearch drops non-member seeds via
    // the member fetch, so a seed set cached BEFORE a removal must give
    // the same walk as the explicitly pruned set — silent shrink, never
    // a stale result and never an error
    val root = tmpRoot("churn")
    KnnStore.build(spark, corpus, cents, root, K)
    val allSeeds = KnnStore.readDir(spark, root).select(col("vec_id"))
      .where(col("vec_id") > 0).orderBy(col("vec_id")).limit(6)
      .collect().map(_.getLong(0)).toSeq
    assert(allSeeds.size == 6)
    val removed = allSeeds.take(2)
    val qv = SimSearch.normEmbeds(spark, dir).where(col("vec_id") === 0)
      .select(col("vn")).head().getSeq[Double](0)
    KnnStore.removeVectors(spark,
      corpus.where(col("vec_id").isin(removed: _*)).select(col("vec_id")),
      root, K)
    def rows(seeds: Seq[Long]) =
      KnnStore.beamSearch(spark, root, qv, 0L, 8, 2, seeds)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq
    val stale = rows(allSeeds)
    val fresh = rows(allSeeds.filterNot(removed.contains))
    assert(stale == fresh,
      "stale seed set did not walk as its surviving subset")
    assert(stale.nonEmpty)
    assert(stale.forall(r => !removed.contains(r._2)),
      "a removed id was served from the walk")
  }

  test("BATCH walk under churn: beamSearchBatch drops stale seeds and " +
    "non-member query exclusions exactly like the single walk") {
    // beamSearchBatch's member fetch is its own code path (union-keyed
    // point reads, Spark-side scoring), so the churn contract is pinned
    // separately from beamSearch's
    val root = tmpRoot("churnbatch")
    KnnStore.build(spark, corpus, cents, root, K)
    val allSeeds = KnnStore.readDir(spark, root).select(col("vec_id"))
      .where(col("vec_id") > 2).orderBy(col("vec_id")).limit(6)
      .collect().map(_.getLong(0)).toSeq
    val removed = allSeeds.take(2)
    val qs = SimSearch.normEmbeds(spark, dir)
      .where(col("vec_id").isin(0L, 1L))
      .select(col("vec_id"), col("vn"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    assert(qs.size == 2)
    KnnStore.removeVectors(spark,
      corpus.where(col("vec_id").isin(removed: _*)).select(col("vec_id")),
      root, K)
    def rows(seeds: Seq[Long]) =
      KnnStore.beamSearchBatch(spark, root, qs, 8, 2, seeds)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    val stale = rows(allSeeds)
    val pruned = rows(allSeeds.filterNot(removed.contains))
    assert(stale == pruned,
      "stale seed set did not walk as its surviving subset")
    assert(stale.nonEmpty)
    assert(stale.forall(r => !removed.contains(r._3)),
      "a removed id was served from the batch walk")
  }

  test("an arrival batch rewrites ONLY the graph partitions it touches — " +
    "every other cell directory stays byte-stable") {
    val root = tmpRoot("touch")
    KnnStore.build(spark, base, cents, root, K)
    def snapshot(sub: String): Map[String, Set[(String, Long, Long)]] =
      Option(new java.io.File(s"$root/$sub").listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.contains("="))
        .map(d => d.getName -> Option(d.listFiles()).toSeq.flatten
          .map(f => (f.getName, f.length(), f.lastModified())).toSet)
        .toMap
    val before = snapshot("graph")
    val touched = KnnStore.addArrivals(spark, arrivals, cents, root, K)
      .select(col("bucket")).collect().map(r => s"bucket=${r.getLong(0)}")
      .toSet
    val after = snapshot("graph")
    val untouchedDirs = before.keySet -- touched
    assert(untouchedDirs.nonEmpty,
      s"vacuous test: the batch touched all ${before.size} partitions")
    untouchedDirs.foreach { p =>
      assert(after(p) == before(p), s"untouched partition $p was rewritten")
    }
    // and the touched set actually changed something
    assert(touched.exists(p => before.get(p) != after.get(p)))
  }
}
