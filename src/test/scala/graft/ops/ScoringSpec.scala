package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Harmonic-sum scoring semantics (sc:293-338): sort desc BEFORE 1/i²,
  * top-K truncation, literature ×0.2 applied BEFORE the 2-element re-rank.
  */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  private def fold1(scores: Seq[Double], k: Int = 100): Double =
    Seq(scores).toDF("s")
      .select(Scoring.harmonicTopK(col("s"), k).as("h"))
      .as[Double].head()

  test("harmonic fold sorts descending before rank weighting") {
    // [0.9, 0.5, 1.0] -> sorted [1.0, 0.9, 0.5] -> 1/1 + 0.9/4 + 0.5/9
    assert(math.abs(fold1(Seq(0.9, 0.5, 1.0)) - (1.0 + 0.225 + 0.5 / 9)) < 1e-12)
  }

  test("top-K truncates after the sort") {
    // k=2 keeps the two LARGEST, not the first two
    assert(math.abs(fold1(Seq(0.9, 0.5, 1.0), k = 2) - (1.0 + 0.225)) < 1e-12)
  }

  test("empty and single-element arrays") {
    assert(fold1(Seq.empty) == 0.0)
    assert(fold1(Seq(0.7)) == 0.7)
  }

  test("two-source combine weights literature x0.2 before re-ranking") {
    val df = Seq((0.5, 1.0), (0.1, 3.0)).toDF("g", "l")
      .select(Scoring.harmonicCombine(col("g"), col("l")).as("h"))
    val Array(a, b) = df.as[Double].collect()
    // g=0.5 dominates l*0.2=0.2: 0.5 + 0.2/4
    assert(math.abs(a - 0.55) < 1e-12)
    // l*0.2=0.6 dominates g=0.1: 0.6 + 0.1/4
    assert(math.abs(b - 0.625) < 1e-12)
  }

  test("harmonic fold bounds: max <= fold <= max * pi^2/6 (non-negative input)") {
    val rnd = new scala.util.Random(42)
    val lists = Seq.fill(50)(Seq.fill(1 + rnd.nextInt(20))(rnd.nextDouble()))
    val rows = lists.toDF("s")
      .select(array_max(col("s")).as("mx"), Scoring.harmonicTopK(col("s"), 100).as("h"))
      .as[(Double, Double)].collect()
    rows.foreach { case (mx, h) =>
      assert(h >= mx - 1e-12 && h <= mx * math.Pi * math.Pi / 6 + 1e-12)
    }
  }
}
