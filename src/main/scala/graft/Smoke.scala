package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: replicates the driver's entry() check (rows > 0 on
  * sf0.001) and optionally runs one named query: `runMain graft.Smoke [name [sfDir]]`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption match {
      case None =>
        val df = SparkEntry.entry(spark)
        println(s"ENTRY_ROWS=${df.count()}")
        df.show(5, truncate = false)
      case Some(name) =>
        val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
        val df = SparkEntry.queries(name)(spark, sfDir)
        println(s"QUERY=$name ROWS=${df.count()}")
        df.show(10, truncate = false)
        df.explain("formatted")
    }
    spark.stop()
  }
}
