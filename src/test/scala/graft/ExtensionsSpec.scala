package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, JaroWinkler, VectorOps}

/** The SQL function surface (GraftExtensions) must dispatch to the same
  * codegen'd Catalyst expressions as the Column API — both registration
  * paths (spark.sql.extensions at construction, register() on a live
  * session) are exercised, differentially against the Column results. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("register() exposes jaro_winkler/cosine_sim/rhp_signature to SQL") {
    GraftExtensions.register(spark)
    import spark.implicits._

    val pairs = Seq(("martha", "marhta"), ("dwayne", "duane"),
      ("entity linking", "entity linkage"), ("", "x"), ("same", "same"))
      .toDF("a", "b")
    pairs.createOrReplaceTempView("ext_pairs")
    val viaSql = spark.sql(
      "SELECT a, b, jaro_winkler(a, b) AS jw FROM ext_pairs")
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    pairs.collect().foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(viaSql(a) === JaroWinkler.similarity(a, b))
    }

    val vecs = Seq((1L, Array(1.0, 2.0, -0.5, 3.0)), (2L, Array(0.5, -1.0, 2.0, 0.0)))
      .toDF("id", "vec")
    vecs.createOrReplaceTempView("ext_vecs")
    val viaSqlV = spark.sql(
      """SELECT v1.id, cosine_sim(v1.vec, v2.vec) AS cos,
        |       rhp_signature(v1.vec, 8) AS sig
        |FROM ext_vecs v1 JOIN ext_vecs v2 ON v2.id = v1.id + 1""".stripMargin)
      .collect()
    assert(viaSqlV.length === 1)
    assert(viaSqlV(0).getDouble(1) ===
      VectorOps.cosine(Array(1.0, 2.0, -0.5, 3.0), Array(0.5, -1.0, 2.0, 0.0)))
    assert(viaSqlV(0).getLong(2) ===
      VectorOps.rhpSignature(Array(1.0, 2.0, -0.5, 3.0), 8))
  }

  test("rhp_signature rejects a non-literal plane count") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT rhp_signature(array(1.0d), cast(id AS int)) FROM range(1)")
        .collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(e).contains("planes"))
  }

  test("spark.sql.extensions constructor path registers the functions") {
    val before = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val jw = s2.sql("SELECT jaro_winkler('martha', 'marhta') AS jw")
        .collect()(0).getDouble(0)
      assert(jw === JaroWinkler.similarity("martha", "marhta"))
    } finally {
      before.foreach { s =>
        SparkSession.setActiveSession(s)
        SparkSession.setDefaultSession(s)
      }
    }
  }
}
