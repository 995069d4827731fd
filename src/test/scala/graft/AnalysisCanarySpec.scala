package graft

/** Fixture-drift canary: EVERY registered query must at least ANALYZE
  * against the current sf0.001 fixtures.
  *
  * Forcing `.queryExecution.analyzed` resolves every column reference and
  * type-checks every expression against the parquet schemas. For most
  * (lazy) queries that executes nothing and is cheap; eager-constructing
  * queries (bucketed-join table writes, checkpointed components, collect-fit
  * KMeans) DO run their construction work here, so the sweep is
  * side-effecting and not uniformly free. This is the structural
  * fix for the failure class rounds 5 and 6 both hit: a fixture
  * regeneration (events.ts nanos → micros) or a bad column ref silently
  * dropped 15 queries from the round record because Verify/Bench swallowed
  * the AnalysisException. With this spec, any such drift turns `sbt test`
  * red the moment it is introduced.
  */
class AnalysisCanarySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every registered query analyzes against sf0.001") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir not present")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(2).mkString(" ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail analysis:\n  ${failures.mkString("\n  ")}")
  }
}
