package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the declarative double-precision dot-product
  * fold over two float arrays —
  *
  *   aggregate(zip_with(a, b, (x, y) -> cast(x) * cast(y)), 0.0d, (acc, v) -> acc + v)
  *
  * (what [[graft.ext.Similarity.dot]] builds, and what a user writing
  * idiomatic higher-order-function SQL produces) — into the native
  * [[FloatDot]] expression. Higher-order functions are CodegenFallback in
  * Spark: each row allocates a zipped array and interprets two lambdas per
  * element. FloatDot is whole-stage-codegen'd with zero allocation and is
  * bit-identical (same IEEE left-to-right accumulation, same NULL
  * semantics for ragged/null input), so the substitution never changes a
  * result — it only removes interpretation overhead.
  *
  * Registered through [[GraftExtensions]] (`injectOptimizerRule`), so any
  * session wired with `spark.sql.extensions=graft.functions.GraftExtensions`
  * gets the rewrite without code changes.
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** cast(<lambda var> as double) */
  private object DoubleCastOfVar {
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case c: Cast if c.dataType == DoubleType =>
        c.child match {
          case v: NamedLambdaVariable => Some(v)
          case _ => None
        }
      case _ => None
    }
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // merge function is exactly (acc, v) -> acc + v
  private def isPlainSum(add: Add, acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
    (add.left, add.right) match {
      case (l: NamedLambdaVariable, r: NamedLambdaVariable) =>
        l.exprId == acc.exprId && r.exprId == v.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
        if isFloatArray(a) && isFloatArray(b) &&
          // element function is exactly (x, y) -> cast(x) * cast(y)
          ((m.left, m.right) match {
            case (DoubleCastOfVar(l), DoubleCastOfVar(r)) =>
              l.exprId == x.exprId && r.exprId == y.exprId
            case _ => false
          }) &&
          isPlainSum(add, acc, v) &&
          // finish function is the identity
          fin.exprId == fa.exprId =>
      FloatDot(a, b)

    // the squared-L2 fold over two double arrays —
    //   aggregate(zip_with(a, b, (x, y) -> (x-y)*(x-y)), 0.0, (acc, v) -> acc + v)
    // (what [[graft.ext.Similarity.l2sq]] builds) — into the native
    // [[DoubleL2Sq]] expression; same bit-identity argument as FloatDot
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fa: NamedLambdaVariable), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          // element function is exactly (x, y) -> (x - y) * (x - y)
          ((m.left, m.right) match {
            case (sl: Subtract, sr: Subtract) =>
              (sl.left, sl.right, sr.left, sr.right) match {
                case (l1: NamedLambdaVariable, r1: NamedLambdaVariable,
                      l2: NamedLambdaVariable, r2: NamedLambdaVariable) =>
                  l1.exprId == x.exprId && r1.exprId == y.exprId &&
                    l2.exprId == x.exprId && r2.exprId == y.exprId
                case _ => false
              }
            case _ => false
          }) &&
          isPlainSum(add, acc, v) &&
          fin.exprId == fa.exprId =>
      DoubleL2Sq(a, b)
  }
}
