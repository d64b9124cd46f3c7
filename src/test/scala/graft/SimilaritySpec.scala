package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.link.Scoring

/** Hand-computed goldens for the three reference similarity measures
  * (similarities.py:28-69). */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (qidA, edgesA, qidB, edgesB)
  val rows = Seq(
    (5L, Seq(1, 2, 3), 5L, Seq(1, 2, 3)), // identical
    (5L, Seq(1, 2, 3), 2L, Seq(7, 8)), // b in edges(a) only
    (5L, Seq(1, 2), 9L, Seq(5, 1)), // a in edges(b), common {1}
    (5L, Seq(1, 2), 9L, Seq(7, 8)), // disjoint
    (5L, Seq(1, 1, 2), 9L, Seq(1, 7)) // duplicate edges (set semantics)
  ).toDF("qa", "ea", "qb", "eb")

  def evalSim(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
      org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)
      : Seq[Double] =
    rows.select(f(col("qa"), col("ea"), col("qb"), col("eb")).as("s"))
      .collect().map(_.getDouble(0)).toSeq

  test("direct link similarity goldens") {
    // a==b -> 2; b in A -> 1; a in B -> 1; disjoint -> 0; dup edges -> 0
    assert(evalSim(Scoring.directLinkSim) == Seq(2.0, 1.0, 1.0, 0.0, 0.0))
  }

  test("edge ratio similarity goldens (self-loops, set semantics)") {
    val got = evalSim(Scoring.edgeRatioSim)
    // identical: A=B={1,2,3,5} -> 1.0
    assert(math.abs(got(0) - 1.0) < 1e-12)
    // A={1,2,3,5}, B={7,8,2}: common={2} -> 0.5*(1/4 + 1/3)
    assert(math.abs(got(1) - 0.5 * (1.0 / 4 + 1.0 / 3)) < 1e-12)
    // A={1,2,5}, B={5,1,9}: common={1,5} -> 0.5*(2/3 + 2/3)
    assert(math.abs(got(2) - 0.5 * (2.0 / 3 + 2.0 / 3)) < 1e-12)
    // A={1,2,5}, B={7,8,9}: disjoint -> 0
    assert(got(3) == 0.0)
  }

  test("one step similarity goldens (beta=0.2)") {
    val b = 0.2
    val got = evalSim(Scoring.oneStepSim(b))
    // identical: beta^2 + (1-b)^2 * 1 * 1 (common=3 of 3)
    assert(math.abs(got(0) - (b * b + (1 - b) * (1 - b))) < 1e-12)
    // b in A (|A|=3), no common: (1-b)*b/3
    assert(math.abs(got(1) - (1 - b) * b / 3) < 1e-12)
    // a in B (|B|=2), common {1}: b*(1-b)/2 + (1-b)^2*(1/2)*(1/2)
    assert(math.abs(got(2) - (b * (1 - b) / 2 + (1 - b) * (1 - b) * 0.25)) < 1e-12)
    assert(got(3) == 0.0)
    // dup edges deduped: A={1,2}, B={1,7}: common {1} -> (1-b)^2*(1/2)*(1/2)
    assert(math.abs(got(4) - (1 - b) * (1 - b) * 0.25) < 1e-12)
  }

  test("qid/pid url normalization (utils.py doctests)") {
    import graft.dict.DictBuild.{qidFromUrl, pidFromUrl}
    val df = Seq(
      "http://www.wikidata.org/entity/Q1234",
      "http://www.wikidata.org/prop/direct/P18",
      "not an id",
      "Q42").toDF("u")
      .select(qidFromUrl(col("u")).as("q"), pidFromUrl(col("u")).as("p"))
    val got = df.collect().map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(got.toSeq == Seq(
      (Some("Q1234"), None), (None, Some("P18")), (None, None), (Some("Q42"), None)))
  }

  test("delete_excluded stream semantics: filtered-out updates delete") {
    import graft.dict.{DictBuild, DictSpec}
    val current = Pipeline.artifacts(spark).entityDict
    assert(current.filter(col("id") === "Q4").count() == 1)
    // an update that flips Q4 to the excluded type (animal) -> delete;
    // and a brand-new valid entity Q99 -> insert
    val q4Update = DictSpec.entityJson(graft.dict.EntitySpec(
      "Q4", Map("en" -> "scan"), Map.empty, Map.empty,
      Seq(graft.dict.ClaimSpec("P31", target = Some(210))), 1, 9999L))
    val q99 = DictSpec.entityJson(graft.dict.EntitySpec(
      "Q99", Map("en" -> "new thing"), Map.empty, Map.empty,
      Seq(graft.dict.ClaimSpec("P31", target = Some(201))), 3, 5000L))
    import spark.implicits._
    val merged = graft.streaming.EventStream.applyDumpUpdates(
      spark, current, spark.createDataset(Seq(q4Update, q99)))
    val ids = merged.select("id").as[String].collect().toSet
    assert(!ids.contains("Q4"))
    assert(ids.contains("Q99"))
    assert(merged.filter(col("id") === "Q99").head().getAs[String]("label") == "new thing")
    // untouched entities intact
    assert(ids.contains("Q8") && ids.contains("Q6"))
  }
}
