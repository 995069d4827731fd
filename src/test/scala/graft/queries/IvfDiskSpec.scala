package graft.queries

import graft.SparkSpec

/** The on-disk IVF index's storage claim, as an executed-plan fact: the
  * probe join on the partition column must reach the index scan as a
  * dynamic partition pruning filter, so only the nprobe probed bucket
  * directories are read — the mechanism that makes a 100 TB on-disk index
  * cost nprobe/NC of its bytes per query. Correctness of the RESULT is the
  * shared q_sim_ann_ivf2 oracle row; this spec pins that the layout, not a
  * full scan, answered it.
  */
class IvfDiskSpec extends SparkSpec {

  test("q_sim_ann_ivf_disk's index scan carries a dynamicpruning partition filter") {
    val df = graft.SparkEntry
      .queries("q_sim_ann_ivf_disk")(spark, "/root/testdata/sf0.001")
    val qe = df.queryExecution
    val rows = df.collect()
    assert(rows.length == 10, s"expected top-10, got ${rows.length}")
    val plan = qe.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected the probe join to prune index partitions at runtime:\n$plan")
  }
}
