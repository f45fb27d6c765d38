package graft

/** The driver-contract smoke, run locally: `entry` exercises both
  * extractor families end-to-end, and every oracle key has a matching
  * query (the inverse need not hold — non-SQL-expressible ops are
  * rows-only by contract).
  */
class SparkEntrySpec extends SparkSpec {

  test("entry runs the real dispatch pipeline and yields both families") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val byEntity = rows.groupBy(_.getAs[String]("entity"))
      .view.mapValues(_.map(_.getAs[String]("code")).toSet).toMap
    assert(byEntity("province") == Set("11"))
    assert(byEntity("regency") == Set("11.01"))
    assert(byEntity("district") == Set("11.01.01"))
    assert(byEntity("village") == Set("11.01.01.2001"))
    assert(byEntity("island") == Set("11.01.40001", "11.01.40002"))
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("registry sizes are exact (guards against silent Map-key dupes)") {
    // A duplicated key in the Map literal would silently drop an entry;
    // pin the exact counts so that shows up as a test failure.
    assert(SparkEntry.queries.size == 88,
      s"queries: ${SparkEntry.queries.keySet.toSeq.sorted}")
    assert(SparkEntry.oracleSql.size == 85,
      s"oracles: ${SparkEntry.oracleSql.keySet.toSeq.sorted}")
  }
}
