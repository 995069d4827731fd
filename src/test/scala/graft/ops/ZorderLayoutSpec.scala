package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Runtime evidence for the Z-order claim q_layout_zorder makes on paper:
  * ONE physical order serving range predicates on BOTH dimensions. Two
  * copies of the same 200k-row table are written with small parquet row
  * groups — one z-sorted, one single-column-sorted — and the same 2-d
  * rectangle predicate is scanned against each. The scan's numOutputRows
  * metric counts rows in row groups that SURVIVED min/max pruning, so the
  * layouts' skipping power is measured, not argued: the x-sorted layout
  * prunes only its sort column (y is uniform inside every x run), while
  * the z-sorted layout prunes on both. This is the file-level mechanism a
  * 100 TB table relies on when laid out by the z key (the per-bucket
  * min/max stats q_layout_zorder emits are exactly these row-group stats
  * at file granularity).
  */
class ZorderLayoutSpec extends SparkSpec {

  private def zv(p: Column, q: Column): Column = (0 until 8).map { b =>
    shiftleft(shiftright(p, b).bitwiseAND(1), 2 * b) +
      shiftleft(shiftright(q, b).bitwiseAND(1), 2 * b + 1)
  }.reduce(_ + _)

  private def scanRows(df: DataFrame): (Long, Long) = {
    val res = df.count()
    val scanned = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.metrics("numOutputRows").value
    }.sum
    (res, scanned)
  }

  test("z-sorted row groups prune a 2-d rectangle; single-column sort cannot") {
    val root = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // x, y decorrelated via murmur so a single-column sort leaves the
    // other dimension uniform inside every run (the honest layout test —
    // id-derived grids would accidentally co-sort both)
    val base = spark.range(0, 200000).select(
      pmod(hash(col("id")), lit(256)).as("x"),
      pmod(hash((col("id") + 1000000000L).cast("int")), lit(256)).as("y"),
      col("id").as("payload"))
    def write(df: DataFrame, sort: Column, path: String): Unit =
      df.repartition(1).sortWithinPartitions(sort)
        .write.option("parquet.block.size", "16384")
        .mode("overwrite").parquet(path)
    write(base, zv(col("x"), col("y")), s"$root/zsorted")
    write(base, col("x"), s"$root/xsorted")

    def rect(path: String) = spark.read.parquet(path)
      .where(col("x").between(100, 115) && col("y").between(100, 115))
    val (nZ, scannedZ) = scanRows(rect(s"$root/zsorted"))
    val (nX, scannedX) = scanRows(rect(s"$root/xsorted"))

    assert(nZ == nX, s"layouts must agree on the answer: $nZ vs $nX")
    assert(nZ > 0, "rectangle unexpectedly empty — fixture drifted")
    // both layouts prune x; only z also prunes y. The x-sorted scan must
    // surface ~16x more rows (its surviving groups span all y); require a
    // conservative 3x so parquet page-index effects can't flake the pin.
    assert(scannedZ * 3 <= scannedX,
      s"z layout should scan far less: z=$scannedZ x=$scannedX of $nZ matches")
    // and z pruning must be real skipping, not a full-file read
    assert(scannedZ * 4 <= 200000L,
      s"z layout scanned most of the file: $scannedZ")
  }
}
