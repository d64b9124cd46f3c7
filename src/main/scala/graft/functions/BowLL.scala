package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import graft.model.Bow

/** Negated BOW phrase log-likelihood (tagger.py:105,117) as a native
  * Catalyst expression. The staged candidate path previously computed this
  * through a Scala UDF, which breaks whole-stage codegen at exactly the
  * widest-fanout point of the plan (one row per mention x candidate); this
  * expression keeps the kernel inside the generated code. The model rides
  * along as a plan reference object — the same per-task serialization the
  * capturing UDF paid, with no ScalaUDF conversion wrappers. */
case class BowNegLL(child: Expression, model: Bow.Model)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(s: Any): Any = -model.phraseLL(s.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bowModel", model, classOf[Bow.Model].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = -$ref.phraseLL($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BowLL {
  import org.apache.spark.sql.graftbridge.Bridge

  def bowNegLL(model: Bow.Model, phrase: Column): Column =
    Bridge.column(BowNegLL(Bridge.expression(phrase), model))
}
