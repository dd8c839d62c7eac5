package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point estimate from a serialized `CountMinSketch` (`graft_cms_estimate`):
  * the probe-side twin of Spark's built-in `count_min_sketch` aggregate,
  * mirroring how `BloomFilterMightContain` probes `BloomFilterAggregate`'s
  * build. The sketch side must be a FOLDABLE binary (a collected build via
  * lit()) — it deserializes once per task, not per row — and the value side
  * a string hashed exactly as the aggregate hashed it when building (both go
  * through the sketch's UTF-8 byte hashing), so estimate ≥ true count always
  * holds (CMS never undercounts). Null sketch or null value → NULL.
  *
  * This is the "sketch prune + exact verify" enabler: filter rows whose
  * estimate clears a threshold (a SUPERSET of the true heavy hitters), then
  * count only the survivors exactly — bounded aggregate state with an exact
  * result, the same contract as the bloom-pruned decontamination join.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, StringType) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_cms_estimate requires a foldable (constant) sketch argument")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cms_estimate requires (binary, string), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_cms_estimate"

  // deserialized once per task (the expression instance travels serialized
  // with the plan; the transient sketch rebuilds lazily from the literal)
  @transient private lazy val sketch: CountMinSketch = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Codegen entry point: boxed so the null-sketch case stays a null result.
    * Probes with the raw UTF-8 bytes — the same bytes the build side hashed
    * — avoiding a per-row String decode + re-encode in the hot filter. */
  def estimateBoxed(v: UTF8String): java.lang.Long =
    if (sketch == null || v == null) null
    else java.lang.Long.valueOf(sketch.estimateCount(v.getBytes))

  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    val est = estimateBoxed(v.asInstanceOf[UTF8String])
    if (est == null) null else est.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
    val rightGen = right.genCode(ctx)
    val est = ctx.freshName("est")
    ev.copy(code =
      code"""
            |${rightGen.code}
            |boolean ${ev.isNull} = true;
            |long ${ev.value} = 0L;
            |if (!${rightGen.isNull}) {
            |  java.lang.Long $est = $ref.estimateBoxed(${rightGen.value});
            |  if ($est != null) { ${ev.isNull} = false; ${ev.value} = $est.longValue(); }
            |}
            |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  val info = new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate")
  val builder: Seq[Expression] => Expression = exprs => CmsEstimate(exprs(0), exprs(1))
}
