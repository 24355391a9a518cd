package graft

import org.scalatest.funsuite.AnyFunSuite

/** README's "Declared query surface" section is the human-navigable form of
  * the driver contract (round-7 verdict #8); this pins it to the code so a
  * new/renamed query that skips the doc fails the build. No session needed —
  * the query maps are constructed without touching Spark.
  */
class DocsSpec extends AnyFunSuite {
  private lazy val readme =
    java.nio.file.Files.readString(java.nio.file.Paths.get("README.md"))

  test("README documents every declared query by name") {
    val missing = SparkEntry.queries.keySet
      .filterNot(q => readme.contains(s"`$q`"))
    assert(missing.isEmpty,
      s"README.md query surface is missing: ${missing.toSeq.sorted}")
  }

  test("README documents the bench-only plans and no phantom queries") {
    val missing = SparkEntry.benchOnly.keySet
      .filterNot(q => readme.contains(s"`$q`"))
    assert(missing.isEmpty, s"README.md missing bench-only: $missing")
    // every backticked snake_case token in the surface section must be a
    // real query key — a stale name in the doc fails too
    val section = readme
      .split("## Declared query surface")(1)
      .split("\n## ")(0)
    val documented = "`([a-z0-9_]+)`".r.findAllMatchIn(section)
      .map(_.group(1)).toSet
      .filterNot(Set("graft", "SparkEntry", "DataFrame")) // prose refs
    // EXACT membership only (round-8 ADVICE: a startsWith fallback let
    // suffix-misspelled names like `scan_orc_foo` pass); legitimate derived
    // tokens — output columns, conf values — are enumerated explicitly.
    val known = SparkEntry.queries.keySet ++ SparkEntry.benchOnly.keySet ++
      Set("cost_vs_lloyd_ok", "cost_vs_lloyd", "doc_id", "true", "false",
        "graft")
    val phantom = documented.filterNot(known.contains)
    assert(phantom.isEmpty, s"README documents unknown queries: $phantom")
  }

  test("rows-only queries are exactly the three MLlib fits") {
    // kmeans_lloyd graduated to a hash oracle in round 10 (lloydLoopSql:
    // unrolled snap12 steps + SQL-emulated tolerance stop); what remains
    // rows-only is exactly the MLlib surface, which has no SQL mirror by
    // construction (internal seeding, seed-dependent cluster ids).
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set("kmeans_fit", "kmeans_fit_random",
      "kmeans_fit_parallel"),
      "a new query is missing its oracle (or a rows-only query went undocumented)")
  }
}
