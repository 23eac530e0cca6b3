package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen'd vector kernels.
  *
  * The declarative alternative — `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * — is a higher-order function, which Catalyst interprets per element
  * (lambda closure, boxed accumulator). These expressions generate a tight
  * primitive double loop instead, keeping similarity scans inside
  * whole-stage codegen. Semantics (including summation ORDER — sequential
  * over indices — and divide-by-zero → NaN/Inf) exactly match the HOF fold,
  * so results are bit-identical and the DuckDB oracle is unaffected.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  // inputs are cast to array<double> by the VectorFunctions wrappers
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
}

/** sum(a[i] * b[i]) over min(len) elements. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))) — one pass, codegen'd. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i); double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dot product with the EXACT semantics of the declarative fold
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: zip_with pads the shorter
  * array with nulls and a null element nulls the whole fold, so this
  * returns NULL when lengths differ or any element is null, else the
  * index-order sum — bit-identical to the HOF, which lets
  * NativeKernelRule substitute it unconditionally. */
case class FoldDotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "fold_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Argmin squared distance from an integer-quantized vector to a fixed
  * centroid matrix — the Lloyd assignment kernel behind
  * [[graft.operators.Clustering.kMeansAssign]].
  *
  * The declarative alternative — unrolling (qᵢ−cᵢ)² literals per centroid
  * into one `array_min(array(struct(...)))` tree — generates O(k·dims)
  * source per row and blows Janino's 64 KB method limit past ~k·dims ≈
  * 300 (observed at k=8 × 64 dims: whole-stage codegen fails and the
  * stage silently falls back to interpreted projection). Here the
  * centroid matrix is a REFERENCE OBJECT and the generated code is a
  * constant-size double loop, so assignment stays inside whole-stage
  * codegen at any k·dims.
  *
  * Semantics exactly match the literal form (and the DuckDB oracle's
  * `list_reduce` fold): distances accumulate left-to-right in dimension
  * order starting from 0.0, and ties keep the SMALLEST centroid id
  * (strict `<` scan in id order). Output struct (d, cid) keeps the
  * struct-comparison field order of the literal form. */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

  override def prettyName: String = "nearest_centroid"

  // the eval path reads elements with ArrayData.getLong — on any other
  // element type that would silently reinterpret bytes into garbage
  // assignments, so misuse must fail analysis, not corrupt results
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = q.numElements()
    var bestD = Double.PositiveInfinity
    var bestJ = 0L
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val m = math.min(n, c.length)
      var d = 0.0
      var i = 0
      while (i < m) {
        val t = q.getLong(i).toDouble - c(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; bestJ = j.toLong }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestJ))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val cref = ctx.addReferenceObj("cents", cents, "double[][]")
      val bestD = ctx.freshName("bestD"); val bestJ = ctx.freshName("bestJ")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val m = ctx.freshName("m")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      s"""double $bestD = Double.POSITIVE_INFINITY;
         |long $bestJ = 0L;
         |for (int $j = 0; $j < $cref.length; $j++) {
         |  double[] $c = $cref[$j];
         |  int $m = java.lang.Math.min($q.numElements(), $c.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $t = (double) $q.getLong($i) - $c[$i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $bestJ = (long) $j; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{java.lang.Double.valueOf($bestD), java.lang.Long.valueOf($bestJ)});""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[NearestCentroid]] plus the RUNNER-UP cluster: struct (d, cid, d2,
  * cid2) where (d2, cid2) is the second-smallest (distance, id) pair —
  * the "nearest competing cluster" that hard-negative mining draws from.
  * Both slots come out of one two-min scan with the same strict-`<`
  * id-order tie rule as [[NearestCentroid]], so (d, cid) here is
  * bit-identical to the single-best kernel and (d2, cid2) equals rank 2
  * of the oracle's row_number ORDER BY (d, cid). Requires >= 2 centroids
  * (checked at construction — a runner-up must exist). */
case class NearestCentroid2(child: Expression, cents: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

  require(cents.length >= 2, s"runner-up needs >= 2 centroids, got ${cents.length}")

  override def prettyName: String = "nearest_centroid2"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false),
    StructField("d2", DoubleType, nullable = false),
    StructField("cid2", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    val n = q.numElements()
    var bestD = Double.PositiveInfinity; var bestJ = 0L
    var secD = Double.PositiveInfinity; var secJ = 0L
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val m = math.min(n, c.length)
      var d = 0.0
      var i = 0
      while (i < m) {
        val t = q.getLong(i).toDouble - c(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { secD = bestD; secJ = bestJ; bestD = d; bestJ = j.toLong }
      else if (d < secD) { secD = d; secJ = j.toLong }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestJ, secD, secJ))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val cref = ctx.addReferenceObj("cents", cents, "double[][]")
      val bestD = ctx.freshName("bestD"); val bestJ = ctx.freshName("bestJ")
      val secD = ctx.freshName("secD"); val secJ = ctx.freshName("secJ")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val m = ctx.freshName("m")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      s"""double $bestD = Double.POSITIVE_INFINITY; long $bestJ = 0L;
         |double $secD = Double.POSITIVE_INFINITY; long $secJ = 0L;
         |for (int $j = 0; $j < $cref.length; $j++) {
         |  double[] $c = $cref[$j];
         |  int $m = java.lang.Math.min($q.numElements(), $c.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    double $t = (double) $q.getLong($i) - $c[$i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $secD = $bestD; $secJ = $bestJ; $bestD = $d; $bestJ = (long) $j; }
         |  else if ($d < $secD) { $secD = $d; $secJ = (long) $j; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{java.lang.Double.valueOf($bestD), java.lang.Long.valueOf($bestJ),
         |    java.lang.Double.valueOf($secD), java.lang.Long.valueOf($secJ)});""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column wrappers + SQL registration. */
object VectorFunctions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def vec_dot(a: Column, b: Column): Column =
    c(DotProduct(e(a.cast("array<double>")), e(b.cast("array<double>"))))

  def cosine_sim(a: Column, b: Column): Column =
    c(CosineSimilarity(e(a.cast("array<double>")), e(b.cast("array<double>"))))

  /** `q` must be array<long> (the quantized-vector convention). */
  def nearest_centroid(q: Column, cents: Array[Array[Double]]): Column =
    c(NearestCentroid(e(q), cents))

  def nearest_centroid2(q: Column, cents: Array[Array[Double]]): Column =
    c(NearestCentroid2(e(q), cents))

  /** Expose as SQL functions (`SELECT cosine_sim(a, b)`). SQL literals may
    * arrive as decimal/float arrays, so children are cast explicitly (the
    * implicit-cast route needs ExpectsInputTypes, whose AbstractDataType is
    * private[sql]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def d(x: Expression): Expression = Cast(x, ArrayType(DoubleType))
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", xs => DotProduct(d(xs(0)), d(xs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", xs => CosineSimilarity(d(xs(0)), d(xs(1))), "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler", xs => JaroWinkler(
      Cast(xs(0), org.apache.spark.sql.types.StringType),
      Cast(xs(1), org.apache.spark.sql.types.StringType)), "scala_udf")
  }
}
