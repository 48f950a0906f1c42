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
}
