package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two `array<float>` columns, accumulated in
  * double precision left-to-right — bit-identical to the
  * `aggregate(zip_with(...))` fold in [[graft.ext.Similarity.dot]] (same
  * IEEE operation order), but whole-stage-codegen'd with zero intermediate
  * array allocation. The fold builds a products array per row pair; at
  * knn-bruteforce scale (|corpus| × |probes| pairs) that allocation
  * dominates — this expression is the SURVEY §7.3 "custom Expression only
  * for perf" case.
  *
  * Semantics are EXACTLY the fold's — unequal lengths and null elements
  * yield NULL — so [[NativeDotRewrite]] may substitute this expression for
  * the declarative pattern anywhere without changing any result. The
  * per-element null checks are skipped at codegen time when the array type
  * says containsNull=false (the parquet embeddings case).
  */
case class FloatDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"float_dot requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  // computed once per expression instance — nullSafeEval hits it per element
  @transient private lazy val mayHaveNullElements: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (mayHaveNullElements && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullElemCheck =
        if (mayHaveNullElements)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native functions: imperative (any session)
  * and via SparkSessionExtensions (spark.sql.extensions=graft.functions.GraftExtensions). */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  val floatDotInfo = new ExpressionInfo(classOf[FloatDot].getName, "float_dot")
  val floatDotBuilder: Seq[Expression] => Expression = exprs => FloatDot(exprs(0), exprs(1))

  /** Spark's own runtime-filter machinery (BloomFilterAggregate /
    * BloomFilterMightContain, SPARK-32268) exposed as callable functions —
    * the distributed bloom build + probe a semi-join prune needs. The
    * aggregate's input must be an xxhash64() long; the probe's bloom side
    * must be a foldable binary (a collected build result via lit()). Graft-
    * prefixed names so a future Spark SQL surface can't collide. */
  val bloomAggInfo = new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg")
  val bloomAggBuilder: Seq[Expression] => Expression = {
    case Seq(c) => new BloomFilterAggregate(c)
    case Seq(c, est) => new BloomFilterAggregate(c, est)
    case exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
  }
  val bloomMightContainInfo =
    new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_bloom_might_contain")
  val bloomMightContainBuilder: Seq[Expression] => Expression =
    exprs => BloomFilterMightContain(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("float_dot", floatDotBuilder, "built-in")
    reg.createOrReplaceTempFunction("sorted_intersect_count", SortedIntersectCount.builder, "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_agg", bloomAggBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_might_contain", bloomMightContainBuilder, "built-in")
    reg.createOrReplaceTempFunction("graft_cms_estimate", CmsEstimate.builder, "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("float_dot"), GraftFunctions.floatDotInfo,
      GraftFunctions.floatDotBuilder))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"), SortedIntersectCount.info,
      SortedIntersectCount.builder))
    ext.injectFunction((FunctionIdentifier("graft_bloom_agg"), GraftFunctions.bloomAggInfo,
      GraftFunctions.bloomAggBuilder))
    ext.injectFunction((FunctionIdentifier("graft_bloom_might_contain"),
      GraftFunctions.bloomMightContainInfo, GraftFunctions.bloomMightContainBuilder))
    ext.injectFunction((FunctionIdentifier("graft_cms_estimate"), CmsEstimate.info,
      CmsEstimate.builder))
    ext.injectOptimizerRule(_ => NativeDotRewrite)
  }
}
