package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from native
  * higher-order functions (`zip_with`/`aggregate`/`transform`) so the whole
  * similarity pipeline stays inside Catalyst — no UDF, no driver collect.
  *
  * Scale shape: per-row ops are narrow and embarrassingly parallel; the only
  * wide stages in the similarity queries are the candidate-pair joins, which
  * the LSH/IVF variants bound to bucket-local neighbourhoods.
  */
object Vectors {

  /** Cast a float vector to double for numerically stable folds. */
  def vecD(v: Column): Column = transform(v, _.cast("double"))

  /** Dot product of two equal-length numeric array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Dot product against a constant integer vector (an LSH hyperplane). */
  def dotConst(v: Column, c: Seq[Int]): Column =
    dotFast(v, typedLit(c.map(_.toDouble)))

  /** Codegen'd dot product via the native graft.functions.DotProduct
    * expression — a tight primitive loop, no per-element lambda dispatch and
    * no intermediate array. Use on hot paths (all-pairs cosine, LSH plane
    * signatures); the HOF `dot` stays as the pure-builtin form.
    */
  def dotFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftSql.dotFast(a, b)

  /** Codegen'd max-cosine argmax over an array<struct<cid,cv,cnrm>>
    * centroid column — the assign kernel as one loop (see ArgmaxCos).
    * Returns struct(cos, cid); `exclude` skips one cid (lit(-1L) = none).
    */
  def argmaxCos(cents: Column, v: Column, nrm: Column, exclude: Column): Column =
    org.apache.spark.sql.graft.GraftSql.argmaxCos(cents, v, nrm, exclude)

  /** Unit-normalize a double vector; pair with dotFast for cheap cosine. */
  def normalize(v: Column): Column = {
    val n = norm(v)
    transform(v, x => x / n)
  }

  /** First 15 hex chars of md5 as a non-negative long — the Scala-side twin
    * of graft.ops.Core.md5Hash64, used to precompute constants that both the
    * Spark plan and the DuckDB oracle embed as literals.
    */
  def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Deterministic random-hyperplane family for sign-LSH over embeddings:
    * component (p,i) = md5("hp|p|i") mod 2001 − 1000 ∈ [−1000, 1000].
    * Derived from a hash so any engine can reproduce the planes exactly.
    */
  def hyperplanes(planes: Int, dim: Int): Seq[Seq[Int]] =
    (0 until planes).map { p =>
      (0 until dim).map(i => (md5Long(s"hp|$p|$i") % 2001L - 1000L).toInt)
    }
}
