package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** TopKPairAgg with DEDUP-ON-INSERT by id: top-K over the DISTINCT pair
  * set of a stream that may present the same (score, id) many times.
  *
  * CONTRACT: every occurrence of an id within a group must carry the SAME
  * score (true whenever the score is a deterministic function of the
  * (group, id) pair — e.g. a cosine between the two fixed vectors). Under
  * that contract, distinct-top-K ≡ top-K of the distinct set, and the
  * dedup can ride the K-sized buffer instead of a full-width DISTINCT:
  *
  *  - id in buffer → skip (only one copy is ever held);
  *  - id previously EVICTED → every held pair beats it (eviction replaces
  *    the worst only when beaten, and buffers only improve), so the
  *    re-insert fails the same comparison — no tombstones needed;
  *  - merge may see the same id from two partitions; both carry the same
  *    score, so keep-first dedup is exact.
  *
  * Why it exists (r12, the NND scored stage): candidate pairs that need a
  * relational DISTINCT before scoring force the pair-sized frame through
  * a shuffle AND park it in two vector re-fetch SMJ sorts (the r10 trap —
  * measured superlinear at 2M vectors). With dedup in the aggregator the
  * pairs can carry both vectors from edge-sized joins straight into the
  * map-side combine and never materialize, sort, or dedup as a relation.
  * Same (score DESC, id ASC) ≡ row_number total order as TopKPairAgg.
  */
class TopKPairDistinctAgg(k: Int) extends TopKPairAgg(k) {

  override def reduce(buf: Array[(Double, Long)],
                      v: (Double, Long)): Array[(Double, Long)] = {
    var i = 0
    while (i < buf.length) {
      if (buf(i)._2 == v._2) {
        // contract guard — LOAD-BEARING (KnnStore's incremental merge and
        // the NND rounds rely on it failing loudly), so it throws
        // unconditionally rather than via an elidable assert: a build
        // compiled with -Xdisable-assertions must not silently revert to
        // arbitrary keep-first. A duplicate id carrying a DIFFERENT score
        // means the caller's score is not a function of (group, id).
        // Double.compare, not ==: NaN duplicates are contract-honoring
        // (the NaN-dedup behavior the spec pins)
        if (java.lang.Double.compare(buf(i)._1, v._1) != 0)
          throw new IllegalStateException(
            s"TopKPairDistinctAgg contract violation: id ${v._2} scored " +
              s"${v._1} and ${buf(i)._1} in one group")
        return buf
      }
      i += 1
    }
    super.reduce(buf, v)
  }

  override def merge(a: Array[(Double, Long)],
                     b: Array[(Double, Long)]): Array[(Double, Long)] = {
    // keep-first by id (equal ids carry equal scores by contract), then
    // the usual bounded top-K; the map records the kept score so a
    // contract-violating duplicate fails loudly instead of keep-first —
    // an unconditional throw, never an elidable assert (see reduce)
    val seen =
      new java.util.HashMap[java.lang.Long, java.lang.Double](a.length + b.length)
    val all = (a ++ b).filter { p =>
      val prev = seen.putIfAbsent(p._2, p._1)
      if ((prev ne null) &&
          java.lang.Double.compare(prev.doubleValue(), p._1) != 0)
        throw new IllegalStateException(
          s"TopKPairDistinctAgg contract violation: id ${p._2} scored " +
            s"${p._1} and $prev across partitions")
      prev eq null
    }
    super.merge(all, Array.empty)
  }
}

object TopKPairDistinctAgg {
  /** Aggregate expression: top-K (score DESC, id ASC) over the DISTINCT
    * (score, id) pairs — ids must score deterministically within a group.
    * Output array element struct fields are `_1` (score) and `_2` (id).
    */
  def topK(score: Column, id: Column, k: Int): Column =
    udaf(new TopKPairDistinctAgg(k), ExpressionEncoder[(Double, Long)]())
      .apply(score, id)
}
