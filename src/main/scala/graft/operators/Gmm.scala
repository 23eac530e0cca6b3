package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-component 1-D Gaussian mixture EM (Dempster et al. 1977) with the
  * [[QualityClassifier]] exactness discipline: the E-step responsibility
  * is quantized to 1e-6 integer units BEFORE the M-step, so every
  * corpus-sized reduction is an exact decimal(38,0) sum under any
  * partitioning, and the M-step update is a fixed chain of
  * correctly-rounded double ops on those exact integers — the oracle
  * unrolls the rounds as CTEs and lands on bit-identical parameters
  * (up to last-ulp libm exp/ln differences absorbed by the
  * quantization, the q240/q158 argument).
  *
  * The fit answers the "is this metric bimodal" question (short-vs-long
  * doc regimes, bot-vs-human session lengths) with actual parameters,
  * where q254's dispersion index only flags that SOMETHING is clumped.
  */
object Gmm {

  private val dec = org.apache.spark.sql.types.DecimalType(38, 0)

  /** EM fit of π·N(μ1,σ1²) + (1−π)·N(μ2,σ2²) to an integral-valued
    * column. Deterministic init from the exact (min, max): μ at the
    * quartile points, σ at range/4 (floored at 1), π = 1/2. Variances
    * are floored at 1e-6 against component collapse. Returns one row:
    * (n_rows, pi1, mu1, sigma1, mu2, sigma2, avg_ll).
    *
    * SCALE: per round ONE corpus aggregation to six decimal sums
    * (map-side combined); the parameter update is a 1-row driver
    * computation (model-sized, the [[Pca]] contract). The value column
    * is localCheckpoint'd once so `iters` rounds re-read a pinned
    * integer column, not the parse lineage. */
  def em1d(df: DataFrame, valueCol: Column, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val xs = df.select(valueCol.cast("long").as("x")).localCheckpoint()
    val b = xs.agg(min("x"), max("x"), count(lit(1))).collect().head
    val (mn, mx, n) = (b.getLong(0), b.getLong(1), b.getLong(2))
    require(n > 0, "GMM fit on an empty relation")
    val range = mx.toDouble - mn.toDouble
    var pi1 = 0.5
    var mu1 = mn.toDouble + range / 4.0
    var mu2 = mn.toDouble + range * 3.0 / 4.0
    var s1 = math.max(range / 4.0, 1.0)
    var s2 = math.max(range / 4.0, 1.0)
    for (_ <- 1 to iters) {
      val xd = col("x").cast("double")
      // A = ln((1−π)/π) + lnφ2 − lnφ1; r1 = 1/(1+exp(A)), quantized
      val a = lit(math.log((1.0 - pi1) / pi1)) -
        (xd - lit(mu2)) * (xd - lit(mu2)) / lit(2.0 * s2 * s2) -
        lit(math.log(s2)) +
        (xd - lit(mu1)) * (xd - lit(mu1)) / lit(2.0 * s1 * s1) +
        lit(math.log(s1))
      val rq = round(lit(1000000.0) / (lit(1.0) + exp(a))).cast("long")
      val g = xs.select(rq.as("rq"), col("x")).agg(
        sum(col("rq").cast(dec)).as("n1"),
        sum(col("rq").cast(dec) * col("x").cast(dec)).as("s1"),
        sum(col("rq").cast(dec) * col("x").cast(dec) * col("x").cast(dec))
          .as("ss1"),
        sum((lit(1000000L) - col("rq")).cast(dec)).as("n2"),
        sum((lit(1000000L) - col("rq")).cast(dec) * col("x").cast(dec))
          .as("s2"),
        sum((lit(1000000L) - col("rq")).cast(dec) * col("x").cast(dec) *
          col("x").cast(dec)).as("ss2")).collect().head
      def d(i: Int) = g.getDecimal(i).doubleValue()
      val (n1, sm1, sq1, n2, sm2, sq2) = (d(0), d(1), d(2), d(3), d(4), d(5))
      pi1 = n1 / (n1 + n2)
      mu1 = sm1 / n1
      mu2 = sm2 / n2
      s1 = math.sqrt(math.max(sq1 / n1 - (sm1 / n1) * (sm1 / n1), 1e-6))
      s2 = math.sqrt(math.max(sq2 / n2 - (sm2 / n2) * (sm2 / n2), 1e-6))
    }
    // average log-likelihood under the FITTED mixture — one fixed chain
    val c = 0.3989422804014327 // 1/sqrt(2*pi), literal shared with the oracle
    val xd = col("x").cast("double")
    val ll = log(
      lit(pi1) * exp((xd - lit(mu1)) * (xd - lit(mu1)) /
        lit(-2.0 * s1 * s1)) * lit(c / s1) +
        lit(1.0 - pi1) * exp((xd - lit(mu2)) * (xd - lit(mu2)) /
          lit(-2.0 * s2 * s2)) * lit(c / s2))
    val out = xs.agg(count(lit(1)).cast("long").as("n_rows"),
      (round(avg(ll) * 1000000.0) / 1000000.0).as("avg_ll"))
      .select(col("n_rows"),
        lit(math.round(pi1 * 1e6) / 1e6).as("pi1"),
        lit(math.round(mu1 * 1e6) / 1e6).as("mu1"),
        lit(math.round(s1 * 1e6) / 1e6).as("sigma1"),
        lit(math.round(mu2 * 1e6) / 1e6).as("mu2"),
        lit(math.round(s2 * 1e6) / 1e6).as("sigma2"),
        col("avg_ll"))
    out
  }
}
