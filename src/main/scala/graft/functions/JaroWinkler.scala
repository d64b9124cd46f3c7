package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native Catalyst expression (north_rule
  * pairwise surface scorer; SURVEY.md §2.7). Standard definition:
  *
  *   jaro = (m/|a| + m/|b| + (m - t)/m) / 3  (m = matches within window
  *          floor(max/2)-1, t = transpositions/2)
  *   jw   = jaro + l * p * (1 - jaro)  with prefix l <= 4, p = 0.1,
  *          applied only when jaro > 0.7 (the classic boost threshold —
  *          matches DuckDB's jaro_winkler_similarity used by the oracle).
  *
  * Implemented with nullSafeEval + codegen-through-static-call so it stays
  * inside whole-stage codegen on the hot pair-scoring path.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  val PrefixScale = 0.1
  val BoostThreshold = 0.7
  val MaxPrefix = 4

  def jaro(a: String, b: String): Double = {
    if (a == b) return 1.0
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatched = new Array[Boolean](la)
    val bMatched = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // transpositions = floor(mismatched aligned pairs / 2): the classic
    // strcmp95 halving, which DuckDB's jaro_winkler_similarity (the
    // driver oracle) also uses — keeping the 0.5 for odd mismatch counts
    // diverges by 0.5/(3m) (caught by the fn_sql oracle on 40-char keys)
    (m / la + m / lb + (m - t / 2) / m) / 3.0
  }

  def similarity(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= BoostThreshold) return j
    var l = 0
    val max = math.min(MaxPrefix, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * PrefixScale * (1.0 - j)
  }

  /** Column API (classic-session expression bridge). */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
  }
}
