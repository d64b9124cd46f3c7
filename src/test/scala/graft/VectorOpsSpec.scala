package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sim.Ann

/** Pins the codegen'd vector kernels (CosineSim, RhpSignature) bit-equal
  * to the round-2 higher-order-function formulations they replaced — the
  * DuckDB oracles re-derive the HOF math, so bit-equality here carries the
  * oracle guarantee over to the fast path. */
class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def vecs = Ann.augmentEmbeddings(
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    .select(col("vec_id"),
      expr("transform(embedding, v -> cast(v as double))").as("vec"))

  test("RhpSignature == HOF signature on every embedding") {
    val mismatch = vecs
      .withColumn("fast", Ann.lshSignature(col("vec"), 8))
      .withColumn("slow", Ann.lshSignatureHof(col("vec"), 8))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatch === 0)
  }

  test("CosineSim == HOF cosine (bit-exact) on sampled pairs") {
    val a = vecs.select(col("vec_id").as("id1"), col("vec").as("v1"))
      .filter(col("id1") % 20 === 0)
    val b = vecs.select(col("vec_id").as("id2"), col("vec").as("v2"))
      .filter(col("id2") % 20 === 1)
    val mismatch = a.crossJoin(b)
      .withColumn("fast", Ann.cosine(col("v1"), col("v2")))
      .withColumn("slow", Ann.cosineHof(col("v1"), col("v2")))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatch === 0)
  }

  test("interpreted eval path matches codegen (collect on tiny frame)") {
    // force the interpreted path through a filter on a non-codegen context:
    // evaluate the expression via .head on a 1-row frame and compare with
    // the kernel called directly
    val row = vecs.limit(1)
      .select(col("vec"), Ann.lshSignature(col("vec"), 8).as("sig"),
        Ann.cosine(col("vec"), col("vec")).as("selfcos"))
      .head()
    val v = row.getAs[scala.collection.Seq[Double]]("vec").toArray
    assert(row.getAs[Long]("sig") ===
      graft.functions.VectorOps.rhpSignature(v, 8))
    assert(math.abs(row.getAs[Double]("selfcos") - 1.0) < 1e-12)
  }

  test("BowNegLL expression == Bow.Model.phraseLL (bit-exact), null-safe") {
    import spark.implicits._
    val bow = graft.model.Bow.Model(
      Map("the" -> 3L, "invited" -> 1L, "speaker" -> 2L, "of" -> 1L,
        "house" -> 1L), 8L)
    val phrases = Seq("dear speaker", "the invited speaker", "Straße zwölf",
      "", "completely unseen words", "the of house").toDF("p")
    val rows = phrases
      .withColumn("ll", graft.functions.BowLL.bowNegLL(bow, col("p")))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(1) === -bow.phraseLL(r.getString(0)))
    }
    // null input -> null output (nullIntolerant)
    val nullRow = Seq((1, Option.empty[String])).toDF("i", "p")
      .withColumn("ll", graft.functions.BowLL.bowNegLL(bow, col("p")))
      .head()
    assert(nullRow.isNullAt(2))
  }
}
