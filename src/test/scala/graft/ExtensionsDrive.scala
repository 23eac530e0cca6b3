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
    val t = spark.sql(
      """SELECT rolling_hash('ab') AS rh,
        |       size(shingle_hashes('a b c d', 3)) AS ns,
        |       text_stats('the cat')[0] AS ntok, text_stats('the cat')[1] AS en,
        |       sorted_intersect_count(array(1L, 5L, 9L), array(5L, 9L, 11L)) AS ic
        |""".stripMargin).collect()(0)
    println(s"== text kernels via SQL: $t")
    assert(t.getLong(0) == ('a'.toInt * 31L + 'b'.toInt) % 1000000007L)
    assert(t.getInt(1) == 2 && t.getLong(2) == 2 && t.getLong(3) == 1 && t.getInt(4) == 2)
    val z = spark.sql(
      """SELECT compression_ratio(repeat('spam eggs ', 100)) AS rep,
        |       compression_ratio('') AS empty""".stripMargin).collect()(0)
    println(s"== compression_ratio via SQL: $z")
    assert(z.getDouble(0) < 0.1 && z.getDouble(1) == 1.0)
    val c = spark.sql(
      """SELECT cpc_section('A01B1/00') AS s, cpc_class('A01B1/00') AS c,
        |  cpc_subclass('A01B1/00') AS sc, cpc_subgroup('A01B1/00') AS sg,
        |  cpc_valid_format('Z01') AS v, cpc_normalize('A 01') AS n""".stripMargin)
      .collect()(0)
    println(s"== cpc surface via SQL: $c")
    assert(c.getString(0) == "A" && c.getString(1) == "A01" &&
      c.getString(2) == "A01B" && c.getString(3) == "A01B1/00" &&
      !c.getBoolean(4) && c.getString(5) == "A01")
    val w = spark.sql(
      """SELECT html_main_text('<nav><a href="/">Home</a></nav>' ||
        |    '<p>ten real words of content sit in this one paragraph</p>') AS t,
        |  canonical_url('HTTP://X.COM:80/A/?utm_s=1&b=2#f') AS u""".stripMargin)
      .collect()(0)
    println(s"== web surface via SQL: $w")
    assert(w.getString(0) == "ten real words of content sit in this one paragraph")
    assert(w.getString(1) == "http://x.com/A?b=2")
    val e = spark.sql(
      """SELECT decode_html_num_refs('em&#8212;dash don&#x27;t &#xD800; &#0;') AS d"""
    ).collect()(0)
    println(s"== entity kernel via SQL: $e")
    assert(e.getString(0) == "em—dash don't &#xD800; &#0;")
    val rm = spark.sql(
      """SELECT robots_meta_has('noindex, nofollow', 'nofollow') AS a,
        |  robots_meta_has('nofollowx', 'nofollow') AS b""".stripMargin)
      .collect()(0)
    println(s"== robots meta via SQL: $rm")
    assert(rm.getBoolean(0) && !rm.getBoolean(1))
    println("== extensions drive: OK")
    spark.stop()
  }
}
