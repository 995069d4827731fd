package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the embedding-compression ANN technique:
  * split each D-dim vector into M subvectors, quantize each against a
  * per-subspace codebook of K codewords, and answer queries with
  * asymmetric-distance computation (ADC): a query precomputes its M×K
  * lookup table once, then every database vector costs M table lookups
  * instead of D multiplies — and the stored corpus shrinks from D floats
  * to M log₂K bits per vector (64×4B → 8B here, 32×).
  *
  * Codebooks here are SAMPLE-ASSIGNED (the first K vectors by id donate
  * their subvectors) rather than Lloyd-trained: deterministic, engine-
  * reproducible, and the assignment/ADC machinery — the part that matters
  * at 100 TB — is identical either way (swap in KMeans.fit per subspace for
  * trained codebooks; the oracle then loses SQL expressibility).
  *
  * Scale shape: the codebook is M×K rows (broadcast literally everywhere);
  * assignment is a per-(vector, subspace) argmin over K broadcast rows —
  * narrow compute, shuffles only for the per-vector regroup; ADC is one
  * broadcast join of codes against the 128-row LUT. Nothing pairwise ever
  * touches the full corpus.
  */
object Pq {

  val Dim = 64
  val M = 8          // subspaces
  val SubDim = Dim / M
  val K = 16         // codewords per subspace

  /** Explode (vec_id, v double[Dim]) into (vec_id, j, sv double[SubDim]). */
  def subvectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${M - 1}), j -> slice(v, j * $SubDim + 1, $SubDim))")))
      .toDF("vec_id", "j", "sv")

  /** Codebook from the first K vectors by id: (j, code, cv). */
  def codebook(sub: DataFrame): DataFrame =
    sub.where(col("vec_id") < K)
      .select(col("j"), col("vec_id").cast("int").as("code"), col("sv").as("cv"))

  /** Lloyd-TRAINED codebooks — the production PQ training path: one
    * deterministic KMeans.fit per subspace (init = the same first-K
    * subvectors the sample codebook uses, so each iteration can only
    * shrink distortion). Returns the same (j, code, cv) shape, so
    * assign/codes/ADC compose unchanged; swapping this in costs the
    * oracle its SQL expressibility (PqSpec pins the distortion ordering
    * instead). Driver state: M × K × SubDim doubles — the KMeans
    * centroid-collect pattern, bounded and audited in SCALE.md.
    */
  def trainedCodebook(sub: DataFrame, iters: Int): DataFrame = {
    val spark = sub.sparkSession
    import spark.implicits._
    val cached = sub.cache()
    try {
      (0 until M).flatMap { j =>
        val e = cached.where(col("j") === j)
          .select(col("vec_id"), col("sv").as("v"))
        KMeans.fit(e, K, iters).map { case (c, cv) => (j, c, cv) }
      }.toDF("j", "code", "cv")
    } finally cached.unpersist(blocking = false)
  }

  /** Nearest codeword per (vector, subspace): (vec_id, j, code, dist).
    * Ties break toward the smaller code id (row_number, not min(dist)
    * alone — both engines order identically).
    */
  def assign(sub: DataFrame, cw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("dist"), col("code"))
    sub.join(broadcast(cw), Seq("j"))
      .select(col("vec_id"), col("j"), col("code"),
        expr("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (a, e) -> a + e)")
          .as("dist"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }

  /** Compressed representation: (vec_id, codes "c0,...,c7", qerr). */
  def codes(asg: DataFrame): DataFrame =
    asg.groupBy(col("vec_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("j"), col("code")))),
          x => x.getField("code").cast("string")), ",").as("codes"),
        round(sum(col("dist")), 4).as("qerr"))

  /** ADC distance lookup table for one query vector: (j, code, pd) —
    * M×K rows, the query's distance to EVERY codeword.
    */
  def adcLut(querySub: DataFrame, cw: DataFrame): DataFrame =
    querySub.join(broadcast(cw), Seq("j"))
      .select(col("j"), col("code"),
        expr("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), 0D, (a, e) -> a + e)")
          .as("pd"))

  /** Approximate distances via the LUT: (vec_id, adist) — M lookups per
    * vector, never a touch of the original floats.
    */
  def adcDistances(asg: DataFrame, lut: DataFrame): DataFrame =
    asg.select(col("vec_id"), col("j"), col("code"))
      .join(broadcast(lut), Seq("j", "code"))
      .groupBy(col("vec_id"))
      .agg(round(sum(col("pd")), 4).as("adist"))
}
