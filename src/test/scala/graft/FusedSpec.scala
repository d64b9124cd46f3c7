package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.link.{FusedAnnotate, Mentions, Scoring}

/** The single-shuffle fused pipeline must equal the staged declarative
  * pipeline end-to-end (same best links, same scores). */
class FusedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("fused annotate equals staged annotate on sf0.001") {
    val a = Pipeline.artifacts(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 60)
    val params = Scoring.Params()
    val model = Scoring.defaultModel()

    val staged = Scoring.bestLinks(
      Mentions.candidates(Mentions.extract(docs, a.dictKeys, a.maxKeyTokens),
        a.dictKeys, a.entityDict, a.pagerank, a.bow), params, model)
      .select("doc_id", "start", "end", "surface", "best_qid", "score")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        (r.getString(3), r.getString(4), r.getDouble(5)))
      .toMap

    val fused = FusedAnnotate.annotate(docs, a, params, model)
      .select("doc_id", "start", "end", "surface", "best_qid", "score")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        (r.getString(3), r.getString(4), r.getDouble(5)))
      .toMap

    assert(fused.keySet == staged.keySet)
    assert(fused.nonEmpty)
    fused.foreach { case (k, (surf, qid, score)) =>
      val (s2, q2, sc2) = staged(k)
      assert(surf == s2 && qid == q2, s"$k link mismatch")
      assert(math.abs(score - sc2) < 1e-9, s"$k score mismatch")
    }
  }

  test("join strategy (no driver dict collect) equals broadcast strategy") {
    val a = Pipeline.artifacts(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 60)
    val params = Scoring.Params()
    val model = Scoring.ctxModel() // non-trivial: scores must agree too
    def run(strategy: String) =
      FusedAnnotate.annotate(docs, a, params, model, strategy)
        .select("doc_id", "start", "end", "surface", "best_qid", "score")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
          (r.getString(3), r.getString(4), r.getDouble(5)))
        .toMap
    val bc = run("broadcast")
    val jn = run("join")
    assert(bc.nonEmpty)
    assert(bc.keySet == jn.keySet)
    bc.foreach { case (k, (surf, qid, score)) =>
      val (s2, q2, sc2) = jn(k)
      assert(surf == s2 && qid == q2, s"$k link mismatch")
      assert(math.abs(score - sc2) < 1e-9, s"$k score mismatch")
    }
  }
}
