package graft

/** Registry integrity: the driver contract (SparkEntry) stays wired — the
  * flagship entry returns rows, names are unique, every oracle belongs to a
  * registered query, and a cross-section of queries runs at sf0.001.
  */
class RegistrySpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique and oracles reference registered queries") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct)}")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("every registered query carries a DuckDB oracle") {
    // the correctness gate is only as strong as its coverage: a query
    // without oracle SQL silently downgrades to a rows-only check — the
    // allowlist names the deliberate exceptions (not SQL-expressible)
    // so a forgotten oracle still fails loudly
    val allowed = Set("learn_iforest") // recursive random tree growth
    val missing = SparkEntry.registry.filter(_.oracle.isEmpty).map(_.name)
      .filterNot(allowed)
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("a cross-section of registry queries runs at sf0.001") {
    val sample = Seq("q06", "op_select_filter", "op_ewm", "op_qcut",
      "ext_dedup_exact", "ext_tfidf", "ext_curation", "learn_hash_split",
      "op_sql_surface", "op_csv_roundtrip",
      // round-6 additions
      "op_interpolate", "op_resample", "ext_chunking", "ext_curation3",
      "learn_ridge", "learn_nb")
    sample.foreach { name =>
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      assert(n >= 0, s"$name failed")
    }
  }
}
