package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated testdata (TESTDATA.md).
  *
  * At 100 TB each of these would be a partitioned parquet dataset on object
  * storage; `spark.read.parquet` on a directory scales transparently — the
  * same code path works for a single file (tests) and a 10k-file dataset
  * (production), with partition pruning + predicate pushdown handled by the
  * parquet DataSource V2.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
      // ([PARQUET_TYPE_ILLEGAL]). Read nanos as long, then rebuild a proper
      // timestamp at micro precision with integral division (a double-based
      // division would lose precision: epoch-nanos ≈ 1.7e18 > 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema.fields.exists(f => f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.LongType))
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries mirror the
    * DuckDB oracle exactly (same table names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
