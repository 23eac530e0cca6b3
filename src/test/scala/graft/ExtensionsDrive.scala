package graft

import org.apache.spark.sql.SparkSession

/** Own-JVM drive for GraftExtensions (session-build-time registration needs
  * a fresh session): `sbt "Test/runMain graft.ExtensionsDrive"`. */
object ExtensionsDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT round(cosine_sim(array(1.0,2.0,3.0), array(2.0,4.0,6.0)), 9) AS c,
        |       vec_dot(array(1.0,2.0), array(3.0,4.0)) AS dp""".stripMargin).collect()(0)
    println(s"== extensions drive: cosine=${r.getDouble(0)} dot=${r.getDouble(1)}")
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 11.0)
    println("== extensions drive: OK")
    spark.stop()
  }
}
