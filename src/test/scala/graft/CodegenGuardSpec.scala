package graft

/** Red-if-fallback codegen guard.
  *
  * Round 9 found a SILENT 5x regression: the literal-unrolled k-means
  * assignment expression outgrew Janino's 64 KB generated-method limit,
  * and whole-stage codegen quietly dropped the stage to interpreted eval
  * (the only symptom was an InternalCompilerException in stderr). This
  * suite turns that failure mode into a build break: the register's
  * custom-expression surfaces and heaviest composed pipelines execute
  * with `spark.sql.codegen.fallback=false` (whole-stage compile errors
  * propagate instead of silently re-executing interpreted) and
  * `spark.sql.codegen.factoryMode=CODEGEN_ONLY` (projection/predicate
  * factories error instead of falling back), so a future model-sized
  * expression tree fails `sbt test`, not the bench.
  *
  * Streaming rows (q78/q128/q136) are excluded: their foreachBatch drives
  * spin their own query lifecycles where these session confs don't
  * propagate the same way, and their expression surface is covered by the
  * batch twins below.
  */
class CodegenGuardSpec extends GraftSpec {

  private val targets = Seq(
    "q21_fingerprint",        // rolling-hash custom Expression
    "q25_sim_topk",           // DotProduct/CosineSimilarity kernels
    "q47_rolling_hash",
    "q57_topk_group",         // typed TopK Aggregator
    "q63_quantize_int8",      // int8 quantize/dot kernels
    "q64_kmv_distinct",       // KMV sketch aggregator
    "q81_repetition",
    "q97_video_real_frames",  // demux/decode seam around codegen'd stages
    "q108_full_pipeline",
    "q114_compression_ratio", // Deflate codegen Expression
    "q121_pipeline_v2",
    "q129_kmeans_embed",      // NearestCentroid reference-object kernel
    "q132_semdedup_clustered",
    "q133_pipeline_v3",
    "q134_gopher_rules",
    "q139_bloom_gated_dedup",  // bloom words array-literal probe
    "q140_hard_negatives",     // NearestCentroid2 reference-object kernel
    "q171_jaro_winkler_match", // JaroWinkler codegen Expression
    "q220_char_entropy",       // CharEntropy codegen Expression
    "q480_html_extract",       // DecodeHtmlNumRefs kernel (round 19)
    "q492_page_metadata",      // pageMeta regex surface incl. canonical
    "q485_link_graph",         // ParseAnchor kernel (round 20)
    "q502_link_optouts")       // ParseAnchor + robotsMetaHas surface

  test("register hot paths execute with codegen fallback disabled") {
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val reg = SparkEntry.queries
      targets.foreach { name =>
        withClue(s"$name under CODEGEN_ONLY: ") {
          // any codegen failure now throws instead of falling back
          reg(name)(spark, sf0001).collect()
        }
      }
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        v => conf.set("spark.sql.codegen.fallback", v))
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        v => conf.set("spark.sql.codegen.factoryMode", v))
    }
  }

  test("the guard is RED on a codegen failure, not silently interpreted") {
    // negative probe: an expression whose generated code cannot compile.
    // Under the guard confs the query must THROW — if Spark ever reverts
    // to silent interpreted fallback despite the confs, this test fails
    // and the positive sweep above is known to be meaningless.
    import spark.implicits._
    val conf = spark.conf
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val bad = org.apache.spark.sql.graft.ColumnBridge.column(
        CodegenGuardSpec.BrokenCodegen(
          org.apache.spark.sql.graft.ColumnBridge.expression($"id")))
      val ex = intercept[Exception] {
        spark.range(10).select(bad.as("x")).collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
        c.getClass.getName.contains("Compile") ||
          String.valueOf(c.getMessage).contains("compile")),
        s"expected a compilation failure to propagate, got: $ex")
    } finally {
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        v => conf.set("spark.sql.codegen.fallback", v))
    }
  }
}

object CodegenGuardSpec {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.DataType

  /** Interpreted eval works; generated code is not Java. */
  case class BrokenCodegen(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = child.dataType
    override def nullSafeEval(x: Any): Any = x
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, _ => "this is deliberately not java;")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
