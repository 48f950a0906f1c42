package graft

/** Smoke: every SparkEntry query runs against sf0.001 and returns rows;
  * every query with an oracle has matching column names (the driver's
  * compare sorts columns by name before hashing). */
class EntrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("events table loads despite TIMESTAMP(NANOS) and has a timestamp ts") {
    val df = Tables.load(spark, sf, "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.count() > 0)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf).count()
        if (n == 0 && name != "v2_missing_parents") Some(s"$name: 0 rows") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("oracle keys are a subset of query keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("every oracle-gated query is run-to-run deterministic (value sets)") {
    // the driver hash-compares values: any nondeterministic retention,
    // tie-break, or float rendering would flake the gate. s4 writes fresh
    // temp dirs per invocation but must yield identical values.
    def snapshot(name: String): Seq[Seq[String]] = {
      val df = SparkEntry.queries(name)(spark, sf)
      val cols = df.columns.sorted.toIndexedSeq
      df.collect().map(r => cols.map(c =>
        String.valueOf(r.get(r.fieldIndex(c))))).toSeq.sortBy(_.mkString(""))
    }
    val flaky = SparkEntry.oracleSql.keySet.toSeq.sorted.flatMap { name =>
      if (snapshot(name) != snapshot(name)) Some(name) else None
    }
    assert(flaky.isEmpty, s"nondeterministic queries: $flaky")
  }

  test("query id prefixes are unique (the bench abbrev tier depends on it)") {
    // at 88+ queries Bench keys the JSON by the segment before the first
    // '_'; a collision silently disables abbreviation and the render can
    // overflow the driver's 2000-char stdout window
    val prefixes = SparkEntry.queries.keySet.toSeq.map(n => n.takeWhile(_ != '_'))
    val dupes = prefixes.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"colliding query id prefixes: ${dupes.mkString(", ")}")
  }
}
