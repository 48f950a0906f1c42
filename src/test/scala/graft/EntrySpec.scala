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

  test("normalizeTs: all three physical ts encodings converge to identical micros") {
    // the round-9 regression class: the driver regenerates testdata and the
    // parquet physical type of events.ts changes under the code. Whatever
    // encoding arrives - epoch-nanos long, TIMESTAMP_NTZ, or TimestampType -
    // normalizeTs must yield the SAME TimestampType micros (UTC session tz).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // values stay inside the nanos-representable window (|us| < 2^63/1000,
    // i.e. +/-292 years of 1970) - the long-nanos ENCODING itself cannot
    // carry dates outside it, so wider values are not a convergence case
    val micros = Seq(0L, 1L, 1700000000000000L, -9000000000000000L,
      9000000000000000L, 1234567890123456L)
    val asNanos = micros.map(_ * 1000L).toDF("ts")
    val asNtz = micros.toDF("us")
      .select(expr("timestamp_micros(us)").cast("timestamp_ntz").as("ts"))
    val asLtz = micros.toDF("us").select(expr("timestamp_micros(us)").as("ts"))
    val out = Seq(asNanos, asNtz, asLtz).map { df =>
      val n = Tables.normalizeTs(df)
      assert(n.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      n.select(unix_micros(col("ts"))).as[Long].collect().toSeq
    }
    assert(out(0) == micros && out(1) == micros && out(2) == micros,
      s"encodings diverged: nanos=${out(0)} ntz=${out(1)} ltz=${out(2)}")
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
