package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the driver-facing registry: the correctness gate only
  * checks queries that ALSO publish oracle SQL, so a query accidentally
  * registered without its oracle silently downgrades to a rows-only
  * check. Pin the exception list explicitly.
  */
class RegistrySpec extends AnyFunSuite {

  /** Queries deliberately shipped without oracle SQL — none since the
    * k-means IVF was integer-milli-stabilized (Similarity.ivfCentroids)
    * and its 3 Lloyd iterations unrolled into DuckDB SQL.
    */
  private val declaredRowsOnly = Set.empty[String]

  test("every registered query has oracle SQL unless declared rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) == declaredRowsOnly, s"queries missing oracles: ${(q -- o) -- declaredRowsOnly}")
  }

  test("no orphan oracles (oracle SQL for a query that doesn't exist)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"orphan oracle entries: $orphans")
  }

  test("oracle SQL strings are non-empty and free of unresolved interpolation artifacts") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // a '|' at line start means a stripMargin was applied twice / missed
      assert(!sql.linesIterator.exists(_.trim.startsWith("| ")), s"$name: stray margin chars")
    }
  }

  // ---- docs-vs-registry consistency: the drift the round-7 audit found
  // (README counts stale, operators missing from OPERATORS.md) cannot
  // recur silently once these are machine-checked.

  private def repoFile(name: String): String = {
    val f = new java.io.File(name)
    val path = if (f.exists()) f else new java.io.File(sys.props("user.dir"), name)
    new String(java.nio.file.Files.readAllBytes(path.toPath), "UTF-8")
  }

  test("every registered query is documented in OPERATORS.md") {
    val ops = repoFile("OPERATORS.md")
    val missing = SparkEntry.queries.keySet.filterNot(q => ops.contains(s"`$q`"))
    assert(
      missing.isEmpty,
      s"queries absent from OPERATORS.md (add a row or mention): ${missing.toSeq.sorted}")
  }

  test("README's advertised registry size matches the registry") {
    val n = SparkEntry.queries.size
    val readme = repoFile("README.md")
    assert(
      readme.contains(s"$n driver-checked queries") && readme.contains(s"($n queries)"),
      s"README.md must advertise the actual registry size ($n)")
  }
}
