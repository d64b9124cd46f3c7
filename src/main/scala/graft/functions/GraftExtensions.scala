package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the library's custom Catalyst expressions.
  *
  * Two registration paths, same builders:
  *
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *     construction (the standard SparkSessionExtensions hook) — the right
  *     path for spark-submit / cluster deployments;
  *   - `GraftExtensions.register(spark)` on an already-running session —
  *     for notebooks and hosts that own the session lifecycle.
  *
  * After either, `SELECT jaro_winkler(a, b)`, `cosine_sim(v1, v2)` and
  * `rhp_signature(vec, 8)` run the same codegen'd kernels the Column API
  * uses (functions/JaroWinkler.scala, functions/VectorOps.scala) — SQL
  * users get the north-rule pairwise scorer and the ANN/near-dup kernels
  * without touching Scala.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {

  private def binary(name: String)(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case args => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${args.length}")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "jaro_winkler" -> binary("jaro_winkler")(JaroWinkler(_, _)),
    "cosine_sim" -> binary("cosine_sim")(CosineSim(_, _)),
    "rhp_signature" -> binary("rhp_signature") {
      case (v, Literal(p: Int, IntegerType)) => RhpSignature(v, p)
      case (_, other) => throw new IllegalArgumentException(
        s"rhp_signature(vec, planes): planes must be an INT literal, got $other")
    })

  /** Register on a live session (see class doc). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
}
