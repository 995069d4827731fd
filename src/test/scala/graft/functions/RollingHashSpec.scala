package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RollingHash
import org.apache.spark.sql.graft.RollingHash.{B, P}

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def direct(ts: Seq[Long], k: Int): Seq[Long] =
    ts.sliding(k).filter(_.length == k)
      .map(w => w.foldLeft(0L)((h, t) => (h * B + t) % P)).toSeq

  test("rolling residues equal the direct polynomial formula") {
    val rnd = new scala.util.Random(5)
    val ts = Seq.fill(40)(math.abs(rnd.nextLong()) % P)
    val out = Seq(ts).toDF("th")
      .select(RollingHash.rollingHash(col("th"), 5).as("rh"))
      .as[Seq[Long]].head()
    assert(out == direct(ts, 5))
    assert(out.forall(h => h >= 0 && h < P))
  }

  test("short inputs yield empty arrays; k=1 is the identity") {
    val out = Seq(Seq(1L, 2L)).toDF("th")
      .select(RollingHash.rollingHash(col("th"), 5).as("rh"))
      .as[Seq[Long]].head()
    assert(out == Seq.empty)
    val id = Seq(Seq(7L, 9L)).toDF("th")
      .select(RollingHash.rollingHash(col("th"), 1).as("rh"))
      .as[Seq[Long]].head()
    assert(id == Seq(7L, 9L))
  }

  test("resolves from SQL with a literal window") {
    val out = spark.sql("SELECT graft_rolling_hash(array(1L, 2L, 3L), 2) AS rh")
      .as[Seq[Long]].head()
    assert(out == Seq(1L * B + 2L, 2L * B + 3L))
  }

  test("duplicate windows collide (the fingerprint property)") {
    val ts = Seq(1L, 2L, 3L, 9L, 1L, 2L, 3L)
    val out = Seq(ts).toDF("th")
      .select(RollingHash.rollingHash(col("th"), 3).as("rh"))
      .as[Seq[Long]].head()
    assert(out.head == out(4)) // [1,2,3] at offsets 0 and 4
  }
}
