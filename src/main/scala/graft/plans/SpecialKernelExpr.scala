package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native special-function kernel call (r18 optimization round):
  * `graft_special('<kernel>', x, …)` evaluates one
  * [[graft.functions.SpecialMath]] static method per row — ONE expression
  * node where the Column-tree form of the same kernel is a 10²–10⁴-node
  * staged tree whose Catalyst analysis/optimization/codegen dominated the
  * query wall (row-count-INDEPENDENT ~3–14 s per run each for
  * wofz/betaincinv/bessel_large/carlson/…, VERDICT r17 item 1 /
  * PERF.md). SpecialMath replays the exact Column op sequence
  * (StrictMath for the log/exp/pow family — what WSCG emits — Math for
  * the rest), so results are bit-identical; SpecialMathSpec pins every
  * kernel against its Column twin and the SpecialQ oracle gates pin the
  * DuckDB mirrors end-to-end. Call sites keep the Column-tree fallback
  * (driver smoke sessions lack the extension).
  */
case class SpecialKernelExpr(kernel: String, children: Seq[Expression])
    extends Expression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq.fill(children.length)(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_special"

  override def checkInputDataTypes(): TypeCheckResult =
    graft.functions.SpecialMath.kernels.get(kernel) match {
      case None =>
        TypeCheckResult.TypeCheckFailure(s"unknown special kernel: $kernel")
      case Some(n) if n != children.length =>
        TypeCheckResult.TypeCheckFailure(
          s"kernel $kernel takes $n args, got ${children.length}")
      case _ => super.checkInputDataTypes()
    }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Double](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Double]
      i += 1
    }
    graft.functions.SpecialMath.dispatch(kernel, vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val anyNull =
      children.zip(evals).collect { case (c, e) if c.nullable => e.isNull }
    val nullCheck =
      if (anyNull.isEmpty) "false" else anyNull.mkString(" || ")
    val args = evals.map(_.value).mkString(", ")
    // kernel names are the SpecialMath static-method names (validated in
    // checkInputDataTypes against the registry), so this call always links
    val call = s"graft.functions.SpecialMath.$kernel($args)"
    ev.copy(code = code"""
      ${evals.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = $nullCheck;
      double ${ev.value} = ${ev.isNull} ? -1.0 : $call;
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpecialKernelExpr =
    copy(children = newChildren)
}
