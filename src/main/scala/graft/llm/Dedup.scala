package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Core

/** Near-duplicate detection: MinHash + LSH banding, SimHash, n-gram Jaccard.
  *
  * Scale shape (the 100 TB plan):
  *  - signatures: one explode over shingles + one hash-agg with map-side
  *    partial mins — the shuffle carries 8 longs per (doc, partition), never
  *    the shingles themselves;
  *  - LSH: bucket self-join on (band, bucket) only — candidate pairs are a
  *    tiny fraction of n²; hot buckets (boilerplate docs) are the skew risk,
  *    handled by AQE skew-join splitting (on by default in Spark 4).
  */
object Dedup {

  /** Exploded distinct-shingle table: (id, w). The shared input of MinHash
    * signatures and exact Jaccard. Core.spread first (r15): the shingle
    * split + per-gram md5 the consumers hang off this explode are the
    * dominant per-row work of the whole dedup family, and they run in the
    * SCAN stage — one task over the fixture's one-row-group files
    * (Core.spread doc); a narrow exchange of the raw docs parallelizes
    * every downstream gram hash. The streaming row-sig path
    * (rowMinhashSigs) deliberately stays shuffle-free — its statelessness
    * IS the contract there.
    */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int,
                   spreadInput: Boolean = true): DataFrame =
    (if (spreadInput) Core.spread(docs) else docs).select(
      col(idCol),
      explode(array_distinct(TextOps.shingles(col(textCol), n))).as("w")
    )

  /** Universal-hash MinHash family: member i maps a base 31-bit hash h to
    * (Ai·h + Bi) mod P, P = 2³¹−1. One md5 per shingle feeds every family
    * member (a per-seed md5 would multiply the dominant hashing cost by the
    * signature width); constants are hash-derived so any engine reproduces
    * the family. All arithmetic stays under 2⁶² — no 64-bit overflow on
    * either engine.
    */
  val P: Long = 2147483647L
  def hashA(i: Int): Long = Vectors.md5Long(s"mha|$i") % (P - 1) + 1
  def hashB(i: Int): Long = Vectors.md5Long(s"mhb|$i") % P

  /** MinHash signature table: (doc_id, mh0..mh{k-1}) over distinct word
    * n-gram shingles. Portable md5-based base hash so an external SQL
    * engine can reproduce signatures bit-for-bit.
    */
  def minhashSigs(docs: DataFrame, idCol: String, textCol: String,
                  n: Int, seeds: Seq[Int],
                  spreadInput: Boolean = true): DataFrame =
    minhashSigsFromShingles(
      shingleTable(docs, idCol, textCol, n, spreadInput), idCol, seeds)

  /** Signature aggregation over an existing (id, w) shingle table — lets a
    * pipeline share one (possibly cached) shingle explode between the
    * signature build and the exact-Jaccard verify. The base hash is
    * materialized as its own column so it is computed once per shingle, not
    * once per family member.
    */
  def minhashSigsFromShingles(sh: DataFrame, idCol: String, seeds: Seq[Int]): DataFrame = {
    val mins = seeds.map(i =>
      min((lit(hashA(i)) * col("hw") + lit(hashB(i))) % P).as(s"mh$i"))
    sh.select(col(idCol), (Core.md5Hash64(col("w")) % P).as("hw"))
      .groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** PER-ROW MinHash signature columns — the STREAMING shape: each doc
    * computes its own signature with array_min folds over a materialized
    * per-shingle hash array, no explode, no groupBy, no shuffle — which is
    * what lets a continuous-ingest stream stay stateless
    * (Streams.lshNearDupTagStream). Values are IDENTICAL to the grouped
    * form (min over the same per-shingle family values — spec-pinned);
    * the grouped form stays the batch shape because its shuffle carries
    * partial mins while this one re-walks the array once per family
    * member. Docs with no shingles get null signatures (callers guard).
    * Appends mh0..mh{k-1} to the input's columns.
    */
  def rowMinhashSigs(df: DataFrame, textCol: String, seeds: Seq[Int],
                     n: Int): DataFrame = {
    // ONE compiled pass per row (r15 opt, guide §4): the old
    // transform/array_min lambda pipeline was interpreted per element
    // (HOFs sit outside whole-stage codegen) and, pinned to the stream
    // side's single scan task by the zero-shuffle contract, WAS the
    // stream screens' wall (~4.5 task-seconds of a 3.3 s q_stream_lsh_batch).
    // RowMinhash replicates the value contract exactly — split-with-
    // empties, n-token windows, md5Hash64 % P, per-family (A·h+B) % P
    // mins, null when no shingles (RowMinhashSpec pins row equality
    // against the lambda form; the dedup-vs-grouped DedupSpec pin holds
    // end-to-end). Materialized behind its own column so the k
    // element_at projections never re-run the kernel.
    // (r15 ADVICE) the internal column name must not collide with a
    // caller column — withColumn would silently REPLACE it
    require(!df.columns.contains("__mhs"),
      "rowMinhashSigs: input already carries a __mhs column")
    val withM = df.withColumn("__mhs",
      org.apache.spark.sql.graft.RowMinhash.rowMinhash(
        col(textCol), n, seeds.map(hashA), seeds.map(hashB)))
    withM.select(df.columns.map(col) ++ seeds.zipWithIndex.map {
      case (s, j) => element_at(col("__mhs"), j + 1).as(s"mh$s")
    }: _*)
  }

  /** Band-bucket key strings of a signature table: (id, bk) with
    * bk = "band|mh_a_mh_b". The key vocabulary of an LSH index.
    */
  def bandKeys(sigs: DataFrame, idCol: String,
               bands: Int, rowsPerBand: Int): DataFrame =
    withBands(sigs, idCol, bands, rowsPerBand)
      .select(col(idCol),
        concat(col("band"), lit("|"), col("bucket")).as("bk"))

  /** One-row bloom bitset over a corpus' LSH band-bucket keys — the static
    * near-dup INDEX a continuous-ingest stream probes
    * (Streams.lshNearDupTagStream): docs whose any band bucket might
    * already exist in the corpus flag for exact verification. md5-based
    * hash family so an external SQL oracle rebuilds the identical bitset
    * (same contract as the decontamination bloom).
    */
  def lshBandBloom(sigs: DataFrame, idCol: String, bands: Int,
                   rowsPerBand: Int, mBits: Int, k: Int): DataFrame =
    bandKeys(sigs, idCol, bands, rowsPerBand)
      .select(Core.md5Hash64(col("bk")).as("h1"),
        Core.md5Hash64(concat(lit("bl|"), col("bk"))).as("h2"))
      .agg(graft.functions.BloomAgg.bloom(col("h1"), col("h2"), mBits, k)
        .as("bloom_bits"))

  /** Band explode of a signature table: one row per (doc, band) carrying
    * the signatures (so pair joins need no re-join back) plus the band's
    * bucket key.
    */
  private def withBands(sigs: DataFrame, idCol: String,
                        bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    val bandStructs = array((0 until bands).map { b =>
      val rows = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), concat_ws("_", rows: _*).as("bucket"))
    }: _*)
    sigs
      .withColumn("bb", explode(bandStructs))
      .select(col(idCol) +: (0 until k).map(i => col(s"mh$i")) :+
        col("bb.band").as("band") :+ col("bb.bucket").as("bucket"): _*)
  }

  private def sigMatches(k: Int) = (0 until k)
    .map(i => when(col(s"x.mh$i") === col(s"y.mh$i"), 1).otherwise(0))
    .reduce(_ + _)

  /** LSH candidate pairs from a signature table: `bands` bands of
    * `rowsPerBand` signature rows; docs sharing any band bucket pair up.
    * Output: (doc1, doc2, est_jaccard) with doc1 < doc2; est_jaccard is the
    * fraction of matching signature rows.
    *
    * Signatures are carried through the band explode so the pair join needs
    * no re-join back to the signature table (one shuffle on the bucket key,
    * one distinct).
    */
  def lshCandidatePairs(sigs: DataFrame, idCol: String,
                        bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    val banded = withBands(sigs, idCol, bands, rowsPerBand)
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(
        col(s"x.$idCol").as("doc1"),
        col(s"y.$idCol").as("doc2"),
        round(sigMatches(k).cast("double") / lit(k), 4).as("est_jaccard"))
      .distinct()
  }

  /** BIPARTITE LSH candidates — the decontamination shape: corpus docs that
    * share any band bucket with a (usually much smaller) reference set,
    * e.g. evaluation benchmarks that must not leak into training data. The
    * join is corpus-bands × reference-bands only — never corpus × corpus —
    * so the reference side's band table is broadcast-sized in practice.
    * Output: (doc_id, ref_id, est_jaccard).
    */
  def lshCandidatesAcross(corpusSigs: DataFrame, refSigs: DataFrame,
                          idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    val cb = withBands(corpusSigs, idCol, bands, rowsPerBand)
    // broadcast pin: the reference side is the small one by contract, and
    // broadcasting it means the 100 TB corpus band table never shuffles at
    // all — the screen is one scan + one map-side hash join.
    val rb = broadcast(withBands(refSigs, idCol, bands, rowsPerBand))
    cb.as("x")
      .join(rb.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
      .select(
        col(s"x.$idCol").as("doc_id"),
        col(s"y.$idCol").as("ref_id"),
        round(sigMatches(k).cast("double") / lit(k), 4).as("est_jaccard"))
      .distinct()
  }

  /** Vote-aggregated SimHash (Charikar STOC'02, as deployed for web dedup
    * in Manku/Jain/Sarma WWW'07): a `bits`-bit fingerprint per doc where
    * bit b is the sign of Σ_tokens (bit b of token hash ? +1 : −1).
    * This is the GROUPED form — one corpus explode over the distinct token
    * set + one map-side-combinable hash agg of `bits` codegen'd sums — the
    * scale shape for wide fingerprints: the HOF form
    * (TextOps.simhashOfHashes) re-folds the token array once per bit with
    * an interpreted lambda, fine at 16 bits, 60 interpreted walks per row
    * at 60. The shuffle carries `bits` longs per (doc, partition).
    * Output: (idCol, sim) with sim in [0, 2^bits).
    */
  def simhashGrouped(docs: DataFrame, idCol: String, textCol: String,
                     bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 60, "Core.md5Hash64 supplies 60 hash bits")
    val votes = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$b"))
    docs
      .select(col(idCol), explode(TextOps.tokenSet(col(textCol))).as("tok"))
      .select(col(idCol), Core.md5Hash64(col("tok")).as("h"))
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until bits).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("sim"))
  }

  /** SimHash Hamming near-dup join via the Manku WWW'07 pigeonhole: pairs
    * whose fingerprints differ in ≤ `maxDist` of blocks·blockBits bits.
    * With maxDist < blocks, at most maxDist blocks can contain a differing
    * bit, so every qualifying pair agrees EXACTLY on ≥ 1 block — the
    * candidate join on (block index, block value) is LOSSLESS and never
    * all-pairs: random non-dups collide on a block with p ≈ n / 2^blockBits
    * per block, so candidate volume stays ~linear while the verify
    * (bit_count of xor — one codegen'd instruction pair) is exact.
    * Fingerprints ride the block explode so the pair join needs no re-join
    * back. Output: (doc1, doc2, hamming) with doc1 < doc2, hamming ≤ maxDist.
    */
  def simhashHammingPairs(sigs: DataFrame, idCol: String,
                          blocks: Int, blockBits: Int, maxDist: Int): DataFrame = {
    require(maxDist < blocks, "pigeonhole soundness needs maxDist < blocks")
    val mask = (1L << blockBits) - 1
    val blockStructs = array((0 until blocks).map { k =>
      struct(lit(k).as("blk"),
        shiftright(col("sim"), k * blockBits).bitwiseAND(lit(mask)).as("blkval"))
    }: _*)
    val banded = sigs
      .withColumn("bb", explode(blockStructs))
      .select(col(idCol), col("sim"),
        col("bb.blk").as("blk"), col("bb.blkval").as("blkval"))
    banded.as("x")
      .join(banded.as("y"),
        col("x.blk") === col("y.blk") && col("x.blkval") === col("y.blkval") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("doc1"), col(s"y.$idCol").as("doc2"),
        col("x.sim").as("sim1"), col("y.sim").as("sim2"))
      .distinct()
      .select(col("doc1"), col("doc2"),
        bit_count(col("sim1").bitwiseXOR(col("sim2"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxDist)
  }

  /** Exact Jaccard for a given candidate-pair table (the scale path:
    * LSH candidates → exact verify). `sh` is a shingleTable.
    * J = |∩| / (|A| + |B| − |∩|).
    */
  def jaccardForPairs(pairs: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sh.as("x"), col("doc1") === col(s"x.$idCol"))
      .join(sh.as("y"), col("doc2") === col(s"y.$idCol") && col("x.w") === col("y.w"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("common"))
    inter
      .join(sizes.as("s1"), col("doc1") === col(s"s1.$idCol"))
      .join(sizes.as("s2"), col("doc2") === col(s"s2.$idCol"))
      .select(col("doc1"), col("doc2"),
        round(col("common").cast("double") /
          (col("s1.sz") + col("s2.sz") - col("common")), 4).as("jaccard"))
  }

  /** Asymmetric shingle containment for candidate pairs:
    * C(A⊆B) = |A∩B| / |A|, both directions. Catches doc-inside-doc
    * duplication that symmetric Jaccard structurally misses — a 50-token
    * quote inside a 5000-token article has J ≈ 0.01 but C ≈ 1.0 (the
    * news/CommonCrawl "quote dedup" gate). Cost shape is identical to
    * jaccardForPairs: candidate-pair-bounded, shared shingle table.
    * (MinHash-LSH candidates are Jaccard-biased, so at scale a
    * containment-first screen seeds candidates from the SMALL side's
    * shingle sample instead; the verify step here is unchanged.)
    */
  def containmentForPairs(pairs: DataFrame, sh: DataFrame,
                          idCol: String): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sh.as("x"), col("doc1") === col(s"x.$idCol"))
      .join(sh.as("y"), col("doc2") === col(s"y.$idCol") && col("x.w") === col("y.w"))
      .groupBy(col("doc1"), col("doc2"))
      .agg(count(lit(1)).as("common"))
    inter
      .join(sizes.as("s1"), col("doc1") === col(s"s1.$idCol"))
      .join(sizes.as("s2"), col("doc2") === col(s"s2.$idCol"))
      .select(col("doc1"), col("doc2"),
        round(col("common").cast("double") / col("s1.sz"), 4).as("cont1"),
        round(col("common").cast("double") / col("s2.sz"), 4).as("cont2"))
  }

  /** Connected components over near-dup pairs: iterative min-label
    * propagation — every doc converges to the smallest doc_id reachable
    * through the pair graph, giving the canonical keeper per duplicate
    * cluster. Fixed iteration count keeps the computation deterministic and
    * oracle-reproducible; `iters` bounds the cluster DIAMETER handled (near-
    * dup clusters are shallow — at 100 TB run until-fixpoint with
    * localCheckpoint every few rounds to cut the growing lineage).
    * Returns (doc_id, cluster).
    */
  def components(pairs: DataFrame, iters: Int,
                 checkpointEvery: Int = 0): DataFrame = {
    val vertices = pairs.select(col("doc1").as("doc_id"))
      .union(pairs.select(col("doc2").as("doc_id"))).distinct()
    // undirected edges + self-loops: one join+groupBy per iteration,
    // materialized pre-partitioned on the join key so iterations shuffle
    // only the (smaller) label frame — the GraphX discipline. The
    // function is eager (the checkpoint runs its jobs at call time);
    // plan-only consumers pay those jobs to build the frame, the
    // documented trade since the old eager-cache shape.
    val edges = pairs.select(col("doc1").as("s"), col("doc2").as("t"))
      .union(pairs.select(col("doc2").as("s"), col("doc1").as("t")))
      .union(vertices.select(col("doc_id").as("s"), col("doc_id").as("t")))
      .repartition(col("t"))
      // localCheckpoint, not cache (r16): the lazy round chain references
      // this frame once per round, and under cache() Catalyst re-ANALYZES
      // the full upstream PAIR lineage (shingles + LSH + verify joins —
      // enormous trees for callers like multipass/corpus_prepare) at
      // every reference — multipass's components step measured ~2.9 s
      // over a 4.7k-pair set, nearly all driver-side (the kcore planning
      // profile). The checkpoint truncates every round's plan to a
      // LogicalRDD scan; the label seed reads the self-loops back out of
      // it (exactly one per vertex — the same rows as the old vertices
      // seed, no distinct), so the caller's pair lineage is analyzed and
      // executed exactly ONCE.
      .localCheckpoint()
    var labels = edges.where(col("s") === col("t"))
      .select(col("s").as("doc_id"), col("s").as("label"))
    for (i <- 1 to iters) {
      labels = edges
        .join(labels.withColumnRenamed("doc_id", "t"), Seq("t"))
        .groupBy(col("s").as("doc_id"))
        .agg(min(col("label")).as("label"))
      // checkpointEvery > 0: each round becomes its OWN action, so the
      // round's shuffle files are reclaimable (ContextCleaner on GC)
      // instead of retained until the final materialization — at 1000x
      // one lazy 4-round action retains the SUM of all rounds' shuffles
      // (the q_pipeline_drug_disease disk lesson applied to loops). The
      // label frame written per round is vertex-sized (2 longs), tiny
      // next to the edge shuffles freed. 0 = single lazy action.
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters) {
        labels = labels.localCheckpoint()
        System.gc()
      }
    }
    val out = labels.withColumnRenamed("label", "cluster").localCheckpoint()
    out
  }

  /** Connected components to FIXPOINT: min-label propagation until no label
    * changes — handles arbitrary cluster diameters (the fixed-`iters`
    * variant above mislabels chains deeper than `iters`; it stays for
    * oracle determinism). `localCheckpoint` every `checkpointEvery` rounds
    * cuts the growing lineage (each iteration otherwise re-plans every
    * previous join); intermediate rounds cache instead, so the convergence
    * probe never recomputes the iteration chain. Edges cache
    * hash-partitioned on the join key, so each round shuffles only the
    * label frame. Convergence costs one aggregate per round, not a
    * join+count: labels only ever DECREASE, so the exact integer label sum
    * strictly decreases iff any label changed (decimal(38,0) — immune to
    * overflow at any id range and deterministic, unlike a double sum).
    * Returns (doc_id, cluster).
    */
  def componentsFixpoint(pairs: DataFrame, checkpointEvery: Int = 3,
                         maxIters: Int = 100): DataFrame = {
    val vertices = pairs.select(col("doc1").as("doc_id"))
      .union(pairs.select(col("doc2").as("doc_id"))).distinct()
    val edges = pairs.select(col("doc1").as("s"), col("doc2").as("t"))
      .union(pairs.select(col("doc2").as("s"), col("doc1").as("t")))
      .union(vertices.select(col("doc_id").as("s"), col("doc_id").as("t")))
      .repartition(col("t"))
      // localCheckpoint, not cache (r16) — same reasoning as components():
      // every fixpoint iteration's step plan otherwise re-analyzes the
      // caller's whole pair lineage through the cached-but-deep edge frame
      .localCheckpoint()
    var labels = edges.where(col("s") === col("t"))
      .select(col("s").as("doc_id"), col("s").as("label"))
      .localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal = df
      .select(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("s"))
      .head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      iter += 1
      val step = edges
        .join(labels.withColumnRenamed("doc_id", "t"), Seq("t"))
        .groupBy(col("s").as("doc_id"))
        .agg(min(col("label")).as("label"))
      val next =
        if (iter % checkpointEvery == 0) step.localCheckpoint()
        else step.cache()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels.unpersist(blocking = false)
      labels = next
    }
    // always hand back a lineage-cut frame: when convergence lands off the
    // checkpointEvery boundary, `labels` is a cache()d frame whose plan
    // still carries the trailing iteration chain — consumers would re-plan
    // (and the cache entry would outlive this call). Same exit discipline
    // as components().
    val out = labels.withColumnRenamed("label", "cluster").localCheckpoint()
    labels.unpersist(blocking = false)
    out
  }

  /** Connected components via alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the path-doubling alternative to min-label propagation.
    * Where label propagation needs O(diameter) rounds (each shuffling the
    * full label frame against the edge cache), two-star converges in
    * O(log² n) rounds by REWRITING the edge set itself: every round hangs
    * nodes directly off their neighbourhood minimum, halving chain depths,
    * until the graph is a forest of stars whose centers are the component
    * minima. At 100 TB the difference is decisive for high-diameter graphs
    * (linked page chains, long citation trails): 60 propagation rounds
    * become ~8 two-star rounds, and the per-round shuffle shrinks with the
    * edge set (stars reached early stop moving — each round's frame is the
    * still-unconverged remainder plus one edge per settled node, whereas
    * label propagation re-shuffles every label every round).
    *
    * Round shape: large-star = one groupBy(min) over the symmetrized edges
    * + one equi-join back (m ≤ u < v keeps every emitted edge canonical
    * a < b with no self-loops); small-star = the same two ops over the
    * smaller-endpoint orientation. Convergence = the emitted set is a star
    * partition, certified structurally (leaves each carry exactly one edge
    * AND no node is both center and leaf) by two cheap aggregates — not by
    * a sum heuristic, because edge sets do not shrink monotonically.
    * Returns (doc_id, cluster) — identical contract to components().
    *
    * checkpointEvery defaults to EVERY round, unlike componentsFixpoint's
    * 3: a round references its input ~12× (sym twice in large-star, the
    * large-star output three more ways in small-star), so an uncut logical
    * plan grows ~12× PER ROUND and Catalyst re-analyzes that tree each
    * iteration — measured 107 s vs 17 s at the 100× smoke (3 rounds), with the
    * label-prop loop's linear plan growth unaffected. cache() alone does
    * not help: it short-circuits execution, not analysis.
    */
  def componentsTwoStar(pairs: DataFrame, checkpointEvery: Int = 1,
                        maxRounds: Int = 20): DataFrame = {
    // localCheckpoint, not cache: the caller's pair lineage (often a full
    // LSH pipeline) would otherwise be ANALYZED ~12× in round 1's plan
    var edges = pairs
      .select(least(col("doc1"), col("doc2")).as("a"),
        greatest(col("doc1"), col("doc2")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      // no distinct here: duplicates are harmless to small-star's min
      // aggregation and its closing distinct collapses them — one fewer
      // edge-sized shuffle per round
      sym.join(mins, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(col("b").as("u"), col("a").as("v"))
      val mins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
      dir.join(mins, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .union(mins.select(col("m").as("a"), col("u").as("b")))
        .distinct()
    }
    // star partition ⇔ every larger endpoint occurs exactly once (each
    // leaf hangs off a single center) and no center is itself a leaf —
    // both checked in ONE keyed pass (a violation is a node seen on both
    // sides, or a leaf seen twice), so the certificate costs a single job
    // per round instead of an agg + a semi-join probe.
    def isStar(e: DataFrame): Boolean =
      e.select(col("a").as("n"), lit(1L).as("ca"), lit(0L).as("cb"))
        .union(e.select(col("b").as("n"), lit(0L).as("ca"), lit(1L).as("cb")))
        .groupBy(col("n"))
        .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
        .where((col("ca") > 0 && col("cb") > 0) || col("cb") > 1)
        .isEmpty
    var round = 0
    while (!isStar(edges) && round < maxRounds) {
      round += 1
      val step = smallStar(largeStar(edges))
      val next =
        if (round % checkpointEvery == 0) step.localCheckpoint()
        else step.cache()
      edges.unpersist(blocking = false)
      edges = next
    }
    val out = edges.select(col("b").as("doc_id"), col("a").as("cluster"))
      .union(edges.select(col("a")).distinct()
        .select(col("a").as("doc_id"), col("a").as("cluster")))
      .localCheckpoint()
    edges.unpersist(blocking = false)
    out
  }

  /** Exact-substring (SPAN-level) dedup — Lee et al. 2022's operator in
    * declarative form: every MAXIMAL token span of length ≥ k that appears
    * verbatim in more than one document. Three stages: (1) positional
    * k-token shingles hashed to one long (the shuffle never carries
    * text); (2) cross-doc shingle set via min(doc) ≠ max(doc) — an
    * all-partial-agg test with no distinct state and no false negatives;
    * (3) per-doc gaps-and-islands merge: consecutive surviving positions
    * at distance ≤ k overlap or touch, so a break opens only when
    * pos > prev + k, and the running break-sum is the span id. Output:
    * (idCol, span_id, start_tok, end_tok, span_toks), all-integer.
    * 100 TB shape: two shingle-table shuffles (dup-set agg + semi-join
    * back, the decontaminate pattern) + one doc-local window.
    */
  def duplicatedSpans(docs0: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Core.spread(docs0) // per-window md5 folds dominate (Core.spread doc)
    val sh = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= k)
      .select(col(idCol), posexplode(transform(
        sequence(lit(1), size(col("toks")) - (k - 1)),
        i => Core.md5Hash64(concat_ws(" ", slice(col("toks"), i, lit(k)))))))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("h"))
    val dups = sh.groupBy(col("h"))
      .agg(min(col(idCol)).as("mn"), max(col(idCol)).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select(col("h"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sh.join(dups, Seq("h"), "left_semi")
      .withColumn("brk",
        when(col("pos") > lag(col("pos"), 1).over(w) + k, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + (k - 1)).as("end_tok"))
      .select(col(idCol), (col("island") + 1).as("span_id"),
        col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).as("span_toks"))
  }

  /** Corpus SCRUB for exact-substring dedup — the actionable half of
    * duplicatedSpans (Lee et al. cut all-but-one occurrence of every
    * duplicated window): rebuilds each document with duplicated spans
    * removed, keeping one global occurrence per duplicated k-gram.
    *
    * Deterministic policy: the KEPT occurrence of a duplicated shingle is
    * its (doc, pos)-minimum; a token is CUT iff some non-kept duplicated
    * occurrence covers it AND no kept occurrence in the same doc protects
    * it (so the keeper doc's span survives intact even where it overlaps
    * other duplicated windows). All decisions are integer/hash
    * comparisons — the scrubbed text is byte-identical cross-engine.
    *
    * Output: (idCol, n_toks_kept, scrubbed_md5); a doc whose every token
    * is cut (a non-keeper exact duplicate) disappears from the output —
    * the rebuild agg has no rows to group — identically in both engines.
    * 100 TB shape: the duplicatedSpans shuffles plus a k-wide coverage
    * explode (Σ tokens × k rows, linear) and one doc-keyed rebuild agg;
    * nothing is corpus-quadratic.
    */
  def scrubSpans(docs0: DataFrame, idCol: String, textCol: String,
                 k: Int): DataFrame = {
    val docs = Core.spread(docs0) // per-window md5 folds dominate (Core.spread doc)
    val sh = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= k)
      .select(col(idCol), posexplode(transform(
        sequence(lit(1), size(col("toks")) - (k - 1)),
        i => Core.md5Hash64(concat_ws(" ", slice(col("toks"), i, lit(k)))))))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("h"))
    // kept occurrence per duplicated hash = min (doc, pos); min ≠ max over
    // docs = the cross-doc test (all map-side partials)
    val dupOcc = sh.groupBy(col("h"))
      .agg(min(col(idCol)).as("mn"), max(col(idCol)).as("mx"),
        min(struct(col(idCol).as("kd"), col("pos").as("kp"))).as("keep"))
      .where(col("mn") =!= col("mx"))
      .select(col("h"), col("keep.kd").as("kd"), col("keep.kp").as("kp"))
    val occ = sh.join(dupOcc, Seq("h"))
      .select(col(idCol), col("pos"),
        (col(idCol) === col("kd") && col("pos") === col("kp"))
          .cast("long").as("kept"))
    // k-wide coverage: token t is protected if ANY covering occurrence is
    // kept, cut if covered at all and unprotected
    val cover = occ
      .select(col(idCol), explode(sequence(col("pos"),
        col("pos") + (k - 1))).as("t"), col("kept"))
      .groupBy(col(idCol), col("t"))
      .agg(max(col("kept")).as("protected"))
      .where(col("protected") === 0L)
      .select(col(idCol).as("cut_doc"), col("t").as("cut_t"))
    // rebuild via per-doc CUT-POSITION SETS, not a corpus-wide token
    // explode: the token-explode form grouped every (doc, i, tok) row —
    // the whole corpus' tokens each carrying ~16 B of row overhead
    // through one shuffle; here only the dup-position sets aggregate
    // (span-volume-sized) and the text rides the doc-keyed join ONCE as
    // whole rows, then the rebuild is a narrow per-row array filter.
    // A/B at sf10 local[32]: 18.3 → 17.6 s — wall is dominated by the
    // shingle stages either way; the win is shuffled BYTES (whole-row
    // text once vs per-token rows), which is what binds on a network.
    // The per-token array_contains probe is O(|cuts|) — bounded by the
    // doc's own dup positions.
    val cutSets = cover.groupBy(col("cut_doc"))
      .agg(sort_array(collect_set(col("cut_t"))).as("cuts"))
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .join(cutSets, col(idCol) === col("cut_doc"), "left")
      .select(col(idCol), col("toks"),
        filter(sequence(lit(1L), size(col("toks")).cast("long")),
          i => col("cuts").isNull || !array_contains(col("cuts"), i))
          .as("kept"))
      .where(size(col("kept")) > 0)
      .select(col(idCol),
        size(col("kept")).cast("long").as("n_toks_kept"),
        md5(array_join(
          transform(col("kept"), i => element_at(col("toks"), i.cast("int"))),
          " ")).as("scrubbed_md5"))
  }

  /** Exact n-gram Jaccard over ALL co-shingled pairs: self-join on shingle.
    * Quadratic in co-shingled docs — at scale, use lshCandidatePairs +
    * jaccardForPairs instead; this exists for small inputs and as the
    * oracle-checkable ground truth.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, minJaccard: Double): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.w") === col("y.w") && col(s"x.$idCol") < col(s"y.$idCol"))
      .groupBy(col(s"x.$idCol").as("doc1"), col(s"y.$idCol").as("doc2"))
      .agg(count(lit(1)).as("common"))
    inter
      .join(sizes.as("s1"), col("doc1") === col(s"s1.$idCol"))
      .join(sizes.as("s2"), col("doc2") === col(s"s2.$idCol"))
      .select(col("doc1"), col("doc2"),
        round(col("common").cast("double") /
          (col("s1.sz") + col("s2.sz") - col("common")), 4).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** AllPairs/PPJoin-style prefix-filter candidate join (Bayardo WWW'07;
    * Xiao et al. WWW'08 Lemma 1): the EXACT counterpart of MinHash-LSH.
    * Order the shingle universe by ascending document frequency (rarest
    * first, ties by shingle); any two sets with J ≥ τ MUST share an
    * element inside their first (n − ⌈τ·n⌉ + 1) elements under that
    * order, so equi-joining on prefix elements alone is LOSSLESS — no
    * false negatives, unlike LSH — while the rare-first order makes the
    * prefix buckets the smallest ones in the corpus. τ = tauNum/tauDen is
    * rational so every threshold compare is integer-exact on both engines.
    *
    * Scale shape (reworked r8): the lemma needs only a CONSISTENT total
    * order on the shingle universe, and the (df, w) tuple IS one — so df
    * comes from a keyed window on w, the per-doc prefix position from a
    * keyed window on the doc, and the candidate join keys on w directly
    * (the old global rank was a bijection on w anyway). The previous form
    * materialized the rank as a row_number over ONE partition and
    * broadcast the whole vocab-rank table — fine while vocab looked
    * Heaps-bounded, but 3-SHINGLE vocab is corpus-sized (≈50M distinct at
    * the 100× smoke; no saturation) and the single-partition sort + the
    * corpus-sized broadcast measured 141 s there. Now every stage is
    * keyed: shuffle on w (df window), shuffle on doc (prefix trim),
    * equi-join on w. The length filter (tauDen·min ≥ tauNum·max, a J ≥ τ
    * necessity) prunes before the distinct. No all-pairs product, no
    * global pass, nothing driver-sized.
    */
  def prefixFilterPairs(sh: DataFrame, idCol: String,
                        tauNum: Long, tauDen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withDf = sh.select(col(idCol), col("w"),
      count(lit(1)).over(Window.partitionBy(col("w"))).as("df"))
    // ⌈τ·n⌉ = (num·n + den − 1) div den; n is a shingle count so the
    // products stay far below 2^53 and the floor-via-cast is exact.
    val pre = withDf
      .select(col(idCol), col("w"), col("df"),
        row_number().over(
          Window.partitionBy(col(idCol)).orderBy(col("df"), col("w")))
          .cast("long").as("pos"),
        count(lit(1)).over(Window.partitionBy(col(idCol))).as("n"))
      .where(col("pos") <= col("n") + lit(1L) -
        floor((lit(tauNum) * col("n") + lit(tauDen - 1)) / lit(tauDen))
          .cast("long"))
    // Positional filter (PPJoin's "P"): J ≥ τ needs overlap
    // α = ⌈num·(na+nb)/(num+den)⌉; a prefix match at positions (pa, pb)
    // caps the still-achievable overlap at 1 + min(na−pa, nb−pb). Pruned
    // 193k → 69k candidates on the sf0.1 corpus (measured) — integer
    // math throughout, losslessness untouched.
    val alpha = floor(
      (lit(tauNum) * (col("a.n") + col("b.n")) + lit(tauNum + tauDen - 1)) /
        lit(tauNum + tauDen)).cast("long")
    // r16: the per-doc set sizes ride OUT of the join (n is functional on
    // the doc id, so the distinct's cardinality is unchanged) — the exact
    // verify downstream then needs no separate sizes groupBy + two joins
    // back to it (§1.2 one pass; plan: 2 fewer joins, 1 fewer agg).
    pre.as("a").join(pre.as("b"),
        col("a.w") === col("b.w") &&
          col(s"a.$idCol") < col(s"b.$idCol") &&
          lit(tauDen) * least(col("a.n"), col("b.n")) >=
            lit(tauNum) * greatest(col("a.n"), col("b.n")) &&
          lit(1L) + least(col("a.n") - col("a.pos"),
            col("b.n") - col("b.pos")) >= alpha)
      .select(col(s"a.$idCol").as("doc1"), col(s"b.$idCol").as("doc2"),
        col("a.n").as("n_a"), col("b.n").as("n_b"))
      .distinct()
  }

  /** Exact similarity self-join at threshold τ = tauNum/tauDen: prefix
    * filter for candidates, then candidate-bounded exact verify. The
    * result set is IDENTICAL to the brute-force all-pairs definition
    * (prefix filtering is lossless), which is exactly what the DuckDB
    * oracle computes. Emits sizes and intersection alongside the rounded
    * Jaccard; the threshold compare itself is integer cross-multiplied.
    */
  def exactSimilarPairs(sh: DataFrame, idCol: String,
                        tauNum: Long, tauDen: Long): DataFrame = {
    // r16: n_a/n_b arrive WITH the candidate pairs (prefixFilterPairs
    // carries the per-doc window count through the join — n is functional
    // on the doc id and the prefix windows already computed it), so the
    // old sizes groupBy over sh and its two joins back are gone: the
    // verify is now ONE candidate-bounded gram join chain + one agg.
    // Values identical (same window count the sizes agg recomputed);
    // probe exactsimform pinned row equality across the forms.
    val pairs = prefixFilterPairs(sh, idCol, tauNum, tauDen)
    pairs
      .join(sh.as("x"), col("doc1") === col(s"x.$idCol"))
      .join(sh.as("y"),
        col("doc2") === col(s"y.$idCol") && col("x.w") === col("y.w"))
      .groupBy(col("doc1"), col("doc2"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_inter"))
      .where(lit(tauDen) * col("n_inter") >=
        lit(tauNum) * (col("n_a") + col("n_b") - col("n_inter")))
      .select(col("doc1"), col("doc2"), col("n_a"), col("n_b"),
        col("n_inter"),
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 6).as("jacc"))
  }
}
