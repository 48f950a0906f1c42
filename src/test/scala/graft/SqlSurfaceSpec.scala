package graft

/** The engine's SQL text surface: registered testdata views + registered
  * custom functions make `spark.sql` a first-class way to drive the same
  * plans as the DataFrame API (the reference has no SQL surface at all —
  * SURVEY.md §2.8; here it falls out of being Spark-native). */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("spark.sql over registered views matches the DataFrame query") {
    Tables.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val df = SparkEntry.queries("q5_region_revenue")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(sql == df && sql.nonEmpty)
  }

  test("registered kernels work from SQL text over real embeddings") {
    graft.functions.VectorExpressions.register(spark)
    Tables.registerAll(spark, sf)
    val rows = spark.sql(
      """SELECT vec_id, floor(vec_cosine(embedding, embedding) * 1000) AS self_sim
        |FROM embeddings LIMIT 5""".stripMargin).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getLong(1) == 1000L)) // cos(v, v) = 1
  }
}
