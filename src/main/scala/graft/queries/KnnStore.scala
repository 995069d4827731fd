package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.llm.Vectors

/** The kNN graph's 100 TB storage story (r12 verdict task 6): the trained
  * probe-2 graph persisted PARTITIONED BY CELL, plus exact incremental
  * maintenance for arrival batches that touches only the cells an arrival
  * probes — the graph-side twin of the on-disk IVF index
  * (q_sim_ann_ivf_disk), extended from "read only probed partitions" to
  * "UPDATE only probed partitions".
  *
  * Layout under `root` (all parquet, partitioned):
  *  - `members`  (bucket=partition): (vec_id, vn, bucket2) — each vector
  *    once, under its PRIMARY cell. Serves candidate fetches: a searcher
  *    (or arrival) scans the primary members of its probed cells.
  *  - `postings` (pcell=partition): (vec_id, vn, home) — each vector
  *    listed under EVERY cell it probes (≤2 rows/vector; `home` = its
  *    primary cell). Serves the reverse question an arrival raises: which
  *    existing vectors PROBE the cell this arrival just landed in (those
  *    gain the arrival as a candidate). The duplication is the classic
  *    posting-list trade — 2× vector storage for partition-pruned reverse
  *    lookups.
  *  - `graph`    (bucket=partition, = owner's home): (vec_id, rank, nbr,
  *    cos) — the top-K edges.
  *
  * INCREMENTAL CONTRACT (KnnStoreSpec pins it as a theorem): after
  * `build(base)` + `addArrivals(batch)`, all three tables are
  * row-identical to `build(base ∪ batch)` against the same centroid
  * frame. This is exact, not approximate: the probe-2 candidate relation
  * {(x, m) : m primary in a cell x probes} decomposes disjointly into
  * base×base (already folded into the stored top-K), arrival×(base∪batch)
  * (computed here from the probed cells' members), and base×arrival (the
  * postings reverse lookup) — and bounded top-K is mergeable
  * (top-K(A ∪ B) = top-K(top-K(A) ∪ B)), so folding the new cross edges
  * into the stored K-sized lists loses nothing. Centroids deliberately do
  * NOT retrain on arrivals (the streaming-ANN contract shared with
  * Streams.ingestScreenPipeline: training is corpus-owned).
  *
  * Scale shape: an arrival batch of m vectors reads ≤2m member
  * partitions + the postings partitions of its primary cells + the graph
  * partitions of affected homes, and rewrites only those — work is
  * O(m · occupancy · K), INDEPENDENT of corpus size n (measured in
  * SCALE.md r13 vs the full rebuild). Dynamic partition overwrite keeps
  * every untouched cell directory byte-identical on disk.
  */
object KnnStore {

  // partition columns read back TYPE-INFERRED (bucket= dirs of longs come
  // back INT) — cast on every read before joining with long keys
  private def readPart(s: SparkSession, path: String, part: String): DataFrame =
    s.read.parquet(path).withColumn(part, col(part).cast("long"))

  private[graft] def readMembers(s: SparkSession, root: String): DataFrame =
    readPart(s, s"$root/members", "bucket")
  private[graft] def readPostings(s: SparkSession, root: String): DataFrame =
    readPart(s, s"$root/postings", "pcell")
  private[graft] def readGraph(s: SparkSession, root: String): DataFrame =
    readPart(s, s"$root/graph", "bucket")

  /** Normalize + assign a (vec_id, v) frame against the static centroid
    * index: (vec_id, vn, bucket, bucket2), primary-assignable rows only
    * (bucket null ⇒ both probed cells empty ⇒ unindexable, the caller's
    * novel path — same drop as knnWithinBucketsProbe2's member set).
    */
  private def assignFrame(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val assign = SimSearch.staticAssignColumn(cents)
    vecs.select(col("vec_id"), Vectors.normalize(col("v")).as("vn"),
        assign(col("v")).as("a"))
      .select(col("vec_id"), col("vn"),
        col("a").getField("bucket").as("bucket"),
        col("a").getField("bucket2").as("bucket2"))
      .where(col("bucket").isNotNull)
  }

  private def postingsOf(assigned: DataFrame): DataFrame =
    assigned.select(col("vec_id"), col("vn"), col("bucket").as("home"),
      explode(array_compact(array(col("bucket"), col("bucket2"))))
        .as("pcell"))

  /** Scored candidates of the probing side against a primary-member side:
    * (vec_id, nbr, cos) — the probe-2 candidate relation restricted to
    * whatever frames the caller passes.
    */
  private def scoreAgainst(probes: DataFrame, members: DataFrame,
      cellCol: String): DataFrame =
    members.as("y")
      .join(probes.as("x"),
        col(s"x.$cellCol") === col(s"y.$cellCol") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("nbr"),
        round(Vectors.dotFast(col("x.vn"), col("y.vn")), 6).as("cos"))

  private def topK(edges: DataFrame, k: Int): DataFrame =
    edges.groupBy(col("vec_id"))
      .agg(graft.functions.TopKPairDistinctAgg
        .topK(col("cos"), col("nbr"), k).as("t"))
      .select(col("vec_id"), posexplode(col("t")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as("nbr"), col("col._1").as("cos"))

  /** Build the store from scratch: members, postings, and the probe-2
    * top-K graph (identical math to knnWithinBucketsProbe2 — the spec
    * pins row-identity against q_sim_knn_graph_trained2 under the same
    * centroid frame).
    */
  def build(s: SparkSession, corpus: DataFrame, cents: DataFrame,
      root: String, k: Int): Unit = {
    assignFrame(corpus, cents)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$root/members")
    val members = readMembers(s, root)
    postingsOf(members)
      .write.mode("overwrite").partitionBy("pcell")
      .parquet(s"$root/postings")
    val probes = readPostings(s, root)
      .select(col("vec_id"), col("vn"), col("pcell").as("bucket"))
    val graph = topK(scoreAgainst(probes,
      members.select(col("vec_id"), col("vn"), col("bucket")), "bucket"), k)
    graph.join(members.select(col("vec_id"), col("bucket")), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$root/graph")
  }

  /** Fold an arrival batch into the store — exact (see the class doc
    * theorem), touching only probed partitions. Returns the per-partition
    * touch summary (bucket, n_rows) of the rewritten graph partitions.
    */
  def addArrivals(s: SparkSession, arrivals: DataFrame, cents: DataFrame,
      root: String, k: Int): DataFrame = {
    // the arrival batch is small by contract — checkpoint once, reuse
    // everywhere (also required: we read AND overwrite the same parquet
    // dirs below, so every new partition content must be materialized
    // before the first overwrite)
    val av = assignFrame(arrivals, cents).localCheckpoint(true)
    val aPost = postingsOf(av).localCheckpoint(true)
    val aProbes = aPost
      .select(col("vec_id"), col("vn"), col("pcell").as("bucket"))
    val aMembers = av.select(col("vec_id"), col("vn"), col("bucket"))

    val members = readMembers(s, root)
    val postings = readPostings(s, root)

    // arrival edges: candidates = primary members (stored ∪ in-batch) of
    // the arrival's probed cells. broadcast(batch side) ⇒ the stored
    // member scan prunes to the probed partitions (the IVF-disk DPP
    // shape).
    val aCands = scoreAgainst(broadcast(aProbes),
        members.select(col("vec_id"), col("vn"), col("bucket")), "bucket")
      .union(scoreAgainst(aProbes, aMembers, "bucket"))
    val arrivalEdges = topK(aCands, k)

    // members gaining the arrival: every stored vector PROBING an arrival
    // primary cell (postings reverse lookup, pruned to arrival cells) —
    // merged into their stored top-K (mergeable bounded agg).
    val gains = postings
      .join(broadcast(av.select(col("vec_id").as("a_id"),
        col("vn").as("avn"), col("bucket").as("pcell"))), Seq("pcell"))
      .select(col("vec_id"), col("home"), col("a_id").as("nbr"),
        round(Vectors.dotFast(col("vn"), col("avn")), 6).as("cos"))
      .localCheckpoint(true)
    val affectedHomes = gains.select(col("home").as("bucket")).distinct()
    val touched = affectedHomes
      .union(av.select(col("bucket"))).distinct().localCheckpoint(true)

    // rewrite graph partitions: touched homes get (merged affected rows +
    // unchanged co-resident rows), arrival primaries additionally get the
    // arrival edges. Read only the touched partitions (broadcast-join
    // prune), materialize, then dynamic-overwrite exactly those dirs.
    val graph = readGraph(s, root)
    val storedTouched = graph.join(broadcast(touched), Seq("bucket"))
    val affectedIds = gains.select(col("vec_id")).distinct()
    val unchanged = storedTouched
      .join(affectedIds, Seq("vec_id"), "left_anti")
    val merged = topK(
      storedTouched.join(affectedIds, Seq("vec_id"), "left_semi")
        .select(col("vec_id"), col("nbr"), col("cos"))
        .union(gains.select(col("vec_id"), col("nbr"), col("cos"))), k)
      .join(broadcast(gains.select(col("vec_id"), col("home").as("bucket"))
        .distinct()), Seq("vec_id"))
    val newGraphRows = unchanged
      .select(col("vec_id"), col("rank"), col("nbr"), col("cos"), col("bucket"))
      .union(merged
        .select(col("vec_id"), col("rank"), col("nbr"), col("cos"), col("bucket")))
      .union(arrivalEdges
        .join(av.select(col("vec_id"), col("bucket")), Seq("vec_id"))
        .select(col("vec_id"), col("rank"), col("nbr"), col("cos"), col("bucket")))
      .localCheckpoint(true)
    newGraphRows
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(s"$root/graph")

    // members: arrival primary partitions gain the batch rows
    val newMemberRows = members
      .join(broadcast(av.select(col("bucket")).distinct()), Seq("bucket"))
      .select(col("vec_id"), col("vn"), col("bucket2"), col("bucket"))
      .union(av.select(col("vec_id"), col("vn"), col("bucket2"), col("bucket")))
      .localCheckpoint(true)
    newMemberRows.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(s"$root/members")

    // postings: every probed cell gains the arrival's posting row
    val newPostingRows = postings
      .join(broadcast(aPost.select(col("pcell")).distinct()), Seq("pcell"))
      .select(col("vec_id"), col("vn"), col("home"), col("pcell"))
      .union(aPost.select(col("vec_id"), col("vn"), col("home"), col("pcell")))
      .localCheckpoint(true)
    newPostingRows.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pcell").parquet(s"$root/postings")

    newGraphRows.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"))
  }
}
