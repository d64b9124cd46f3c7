package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.link.Mentions
import graft.dict.DictSpec

class MentionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val a = Pipeline.artifacts(spark)

  private def extract(texts: String*) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Mentions.extract(docs, a.dictKeys, a.maxKeyTokens)
      .select("doc_id", "start", "end", "surface")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .toSet
  }

  test("golden: dictionary spans with NO_SUB overlap resolution") {
    // 'hash' ⊂ 'hash join'; 'slow','query' ⊂ 'slow query' — all dropped
    assert(extract("the hash join is slow query order") == Set(
      (0L, 4, 13, "hash join"),
      (0L, 17, 27, "slow query"),
      (0L, 28, 33, "order")))
  }

  test("golden: ambiguous surface kept as a single span") {
    assert(extract("merge join order the merge") == Set(
      (0L, 0, 10, "merge join"),
      (0L, 11, 16, "order"),
      (0L, 21, 26, "merge")))
  }

  test("prune filter kills lowercase 1-2 char alias matches") {
    // 'a' is an alias of Q34 but every lowercase standalone match is pruned
    assert(extract("a window a") == Set((0L, 2, 8, "window")))
  }

  test("multi-doc extraction keeps doc-local offsets") {
    val got = extract("spark stream", "table scan spark")
    assert(got == Set(
      (0L, 0, 5, "spark"), (0L, 6, 12, "stream"),
      (1L, 0, 10, "table scan"), (1L, 11, 16, "spark")))
  }

  test("candidate ranking: top candidate for 'merge' is Q8 by pagerank") {
    val docs = Seq((0L, "the merge is big")).toDF("doc_id", "text")
    val mentions = Mentions.extract(docs, a.dictKeys, a.maxKeyTokens)
    val cands = Mentions.candidates(mentions, a.dictKeys, a.entityDict, a.pagerank, a.bow)
      .orderBy("start", "tag_order")
      .select("surface", "qid", "tag_order")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val mergeCands = cands.filter(_._1 == "merge")
    assert(mergeCands.toSeq == Seq(("merge", "Q8", 1), ("merge", "Q2", 2)))
    assert(cands.filter(_._1 == "big").map(_._2).toSeq == Seq("Q36"))
  }

  test("log_likelihood is the negated BOW phrase likelihood") {
    val docs = Seq((0L, "spark window")).toDF("doc_id", "text")
    val mentions = Mentions.extract(docs, a.dictKeys, a.maxKeyTokens)
    val cands = Mentions.candidates(mentions, a.dictKeys, a.entityDict, a.pagerank, a.bow)
      .select("surface", "log_likelihood").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(cands("spark") - (-a.bow.phraseLL("spark"))) < 1e-12)
    assert(cands("spark") > 0) // rare words have negative ll
  }

  test("text cap at 10k chars (tagger.py:41)") {
    val longText = ("filler " * 2000) + "spark" // 'spark' past the cap
    val got = extract(longText)
    assert(!got.exists(_._4 == "spark"))
  }
}
