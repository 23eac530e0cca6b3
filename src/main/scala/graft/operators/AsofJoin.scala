package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single latest right row with
  * `right.ts <= left.ts` within the same key group (the time-series join
  * Spark lacks natively; DuckDB spells it ASOF JOIN).
  *
  * Implementation is composition (SURVEY §2.5 preference (a)): tag both
  * sides, union, and carry the most recent right payload forward with a
  * `last(_, ignoreNulls)` running window ordered by (ts, side) — right rows
  * sort before left rows at equal ts so the match is inclusive. One shuffle
  * on the key columns, no custom physical operator needed.
  *
  * SCALE: equivalent to a sort-merge as-of: both inputs shuffle once by key
  * and sort by ts — the same cost profile as a sort-merge join, with state
  * bounded to one payload per key. Skewed keys behave like any window
  * (salt or split the hot key upstream if one user dominates).
  */
object AsofJoin {

  /** @param left        probe side (keeps every row)
    * @param right       reference side (latest at-or-before match)
    * @param keys        equi-join key columns present on both sides
    * @param tsCol       ordering column name (numeric or timestamp), both sides
    * @param rightPayload right-side columns to surface (null when no match) */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(keys.contains).filter(_ != tsCol)
    // the right payload travels as ONE nullable struct so a match is atomic
    // (no per-column mixing of different right rows)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++ leftCols.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
    carried.where(col("__side") === 1)
      .select(keys.map(col) ++ Seq(col(tsCol)) ++ leftCols.map(col) ++
        rightPayload.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Forward as-of join — for each left row, the single EARLIEST right
    * row with `right.ts >= left.ts` in the key group (the "next quote
    * after the order" direction). Mirror of [[backward]]: left rows tag
    * __side 0 so they sort BEFORE an equal-ts right row, and the first
    * right payload is taken from the [current, ∞) frame. Same one-
    * shuffle sort-merge cost profile. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(keys.contains).filter(_ != tsCol)
    val rStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++ leftCols.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = l.unionByName(r)
      .withColumn("__m", first(col("__r"), ignoreNulls = true).over(w))
    carried.where(col("__side") === 0)
      .select(keys.map(col) ++ Seq(col(tsCol)) ++ leftCols.map(col) ++
        rightPayload.map(c => col(s"__m.$c").as(c)): _*)
  }
}
