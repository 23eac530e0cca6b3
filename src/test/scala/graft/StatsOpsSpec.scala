package graft

import graft.operators.{Profiling, TrainingPrep}
import org.apache.spark.sql.functions._

/** Behavioral checks for the statistical-analysis operators (χ² feature
  * selection, KS drift) on planted frames — the DuckDB oracle rows
  * (q200/q201) prove cross-engine equivalence; these prove the
  * statistics behave as the definitions demand. */
class StatsOpsSpec extends GraftSpec {
  import spark.implicits._

  test("chi2: a perfectly label-separating token dominates; universal tokens are excluded") {
    val docs = Seq(
      (1L, "alpha zz common", 1L), (2L, "beta zz common", 1L),
      (3L, "gamma zz common", 1L), (4L, "delta common", 0L),
      (5L, "epsilon common", 0L), (6L, "zeta common", 0L))
      .toDF("doc_id", "text", "y")
    val out = TrainingPrep.chiSquaredTokens(docs, col("y") === 1L, topK = 10)
      .collect()
    assert(out.head.getString(0) == "zz", "separator token must rank first")
    assert(out.head.getDouble(3) == 6.0, "perfect 3/3-vs-0/3 split: chi2 = N")
    assert(!out.map(_.getString(0)).contains("common"),
      "a token in every doc has an empty complement cell and is excluded")
  }

  test("chi2: independent token scores zero") {
    val docs = Seq(
      (1L, "tok filler1", 1L), (2L, "tok filler2", 0L),
      (3L, "other filler3", 1L), (4L, "other filler4", 0L))
      .toDF("doc_id", "text", "y")
    val row = TrainingPrep.chiSquaredTokens(docs, col("y") === 1L, topK = 10)
      .where(col("token") === "tok").collect().head
    assert(row.getDouble(3) == 0.0, "balanced 1/1-vs-1/1 token: chi2 = 0")
  }

  test("ksDrift: identical distributions give D = 0") {
    val df = (1 to 50).flatMap(v => Seq((v.toLong, 0L), (v.toLong, 1L)))
      .toDF("x", "g")
    val d = Profiling.ksDrift(df, "x", col("g") === 1L).collect().head
    assert(d.getAs[Double]("d_stat") == 0.0)
  }

  test("ksDrift: disjoint supports give D = 1 at the boundary value") {
    val df = ((1 to 30).map(v => (v.toLong, 1L)) ++
      (31 to 60).map(v => (v.toLong, 0L))).toDF("x", "g")
    val d = Profiling.ksDrift(df, "x", col("g") === 1L).collect().head
    assert(d.getAs[Double]("d_stat") == 1.0)
    assert(d.getAs[Long]("at_value") == 30L,
      "max ECDF gap sits at the end of group 1's support")
  }

  test("ksDrift: shifted distribution is detected with the textbook D") {
    // group1 uniform on 1..100, group2 uniform on 51..150: D = 0.5 at v=100
    val df = ((1 to 100).map(v => (v.toLong, 1L)) ++
      (51 to 150).map(v => (v.toLong, 0L))).toDF("x", "g")
    val d = Profiling.ksDrift(df, "x", col("g") === 1L).collect().head
    assert(d.getAs[Double]("d_stat") == 0.5)
  }
}
