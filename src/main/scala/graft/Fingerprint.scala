package graft

/** Dev tool: fingerprint the query-key set and oracle-SQL text so a
  * mechanical refactor of the SparkEntry maps (the family split) can be
  * proven content-identical before/after. */
object Fingerprint {
  def main(args: Array[String]): Unit = {
    def sha(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val qk = SparkEntry.queries.keys.toSeq.sorted.mkString(",")
    val os = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => k + " " + v }.mkString("\n")
    println("QKEYS " + SparkEntry.queries.size + " " + sha(qk))
    println("ORACLE " + SparkEntry.oracleSql.size + " " + sha(os))
  }
}
