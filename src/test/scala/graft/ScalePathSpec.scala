package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.dedup.Dedup
import graft.textstats.TextStats

/** Pins the production id paths (xxhash64, pure projection — no global
  * window, no vocabulary join) to the oracle-parity rank paths: the ids
  * differ but every set-level output must be identical. */
class ScalePathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def docs: DataFrame = Dedup.augment(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))

  // LSH candidate sets are id-dependent by nature (minhash permutes the id
  // space), so the pin is recall + measurement agreement, not set equality:
  // the planted near-dups (augment: doc -> doc+10^6 for doc%50==0) must all
  // survive LSH+verify on the xxhash64 path, and the exact-jaccard values
  // must agree wherever both paths propose a pair.
  test("xxhash64 LSH finds every planted near-dup pair after verify") {
    val planted = (0L until 500L by 50L).map(d => (d, d + 1000000L)).toSet
    val xx = Dedup.jaccardVerify(
      docs, Dedup.minhashCandidates(docs, idMode = "xxhash64"), 0.5,
      idMode = "xxhash64")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(xx), s"missing: ${planted -- xx}")
  }

  test("exact-jaccard values agree across id modes on shared pairs") {
    def verified(mode: String) = Dedup.jaccardVerify(
      docs, Dedup.minhashCandidates(docs, idMode = mode), 0.5, idMode = mode)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rank = verified("rank")
    val xx = verified("xxhash64")
    val shared = rank.keySet.intersect(xx.keySet)
    assert(shared.size >= 10)
    shared.foreach { k =>
      assert(rank(k) == xx(k), s"$k jaccard differs") // set ratio: id-free
    }
  }

  // The incremental (committed-index) pass must reproduce the one-shot
  // result restricted to pairs touching the delta, in BOTH id modes — the
  // xxhash64 case is the load-bearing one: content-addressed ids make the
  // day-1 index batch-independent, so the equality proves the delta can be
  // processed with no access to day-1 text.
  test("incremental delta dedup equals one-shot pairs touching the delta") {
    import org.apache.spark.sql.functions.col
    for (mode <- Seq("rank", "xxhash64")) {
      val oneShot = Dedup.jaccardVerify(docs,
          Dedup.minhashCandidates(docs, idMode = mode), 0.5, idMode = mode)
        .filter(col("doc1") >= 1000000L || col("doc2") >= 1000000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val incr = Dedup.incrementalNearDups(spark, docs,
          col("doc_id") >= 1000000L, 0.5, idMode = mode)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(incr.nonEmpty, s"mode=$mode produced no pairs")
      assert(incr == oneShot, s"mode=$mode: " +
        s"extra=${incr -- oneShot} missing=${oneShot -- incr}")
    }
  }

  test("fingerprint duplicate-grouping identical under both id modes") {
    def groups(mode: String): Set[Set[Long]] =
      TextStats.fingerprint(docs, idMode = mode)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val rank = groups("rank")
    val xx = groups("xxhash64")
    assert(rank.nonEmpty)
    assert(rank == xx)
  }
}
