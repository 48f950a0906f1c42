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
      // events.ts has shipped under three physical encodings across driver
      // testdata generations; normalize all of them to TimestampType so
      // every downstream query (unix_micros, window, watermark) sees ONE
      // logical type regardless of which files it reads.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize a `ts` column to [[org.apache.spark.sql.types.TimestampType]]
    * across the physical encodings the driver's testdata has used:
    *
    *  - parquet TIMESTAMP(NANOS) read as `LongType` (legacy nanosAsLong):
    *    rebuild at micro precision with integral division — a double-based
    *    division would lose precision (epoch-nanos ≈ 1.7e18 > 2^53);
    *  - parquet timestamp[us] without isAdjustedToUTC, read as
    *    `TimestampNTZType`: cast to TimestampType. All sessions pin
    *    `spark.sql.session.timeZone=UTC`, so the cast is a pure
    *    re-tagging — wall-clock micros and unix micros coincide;
    *  - already `TimestampType`: pass through.
    *
    * Works on batch AND streaming frames (pure projection, no action).
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so `spark.sql` queries mirror the
    * DuckDB oracle exactly (same table names). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
