package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE can't fix (e.g. a broadcast-too-
  * big dimension with one hot key): salt the skewed side N ways, replicate
  * the other side N times, join on (key, salt).
  *
  * SCALE: converts one straggler task into `salt` parallel tasks at the cost
  * of replicating the build side `salt` x — use for hot-key fact⋈mid-size
  * joins; prefer AQE skew-join for plain sort-merge cases.
  */
object SkewUtils {

  /** Inner equi-join with `salt`-way salting of `skewed` against a
    * `salt`-times replicated `other`. Column sets must be disjoint apart
    * from `key`. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salt: Int): DataFrame = {
    val s = skewed.withColumn("__salt", (rand(seed = 42L) * salt).cast("int"))
    val o = other.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    s.join(o, Seq(key, "__salt")).drop("__salt")
  }
}
