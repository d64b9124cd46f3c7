package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dict.DictBuild
import graft.link.Mentions

/** The profile's `solrconfig` drives the analyzer chain END-TO-END
  * (dictionary build + span extraction), not just the golden-tested token
  * normalizer: an affiliations-profile dictionary must match
  * case-insensitively (configsets/affiliations/conf/managed-schema:65-75
  * adds LowerCaseFilterFactory; tapioca's chain has none). */
class AnalyzerPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dictOf(label: String) =
    Seq(("Q686", label, Seq.empty[String], Seq.empty[String]))
      .toDF("id", "label", "aliases", "extra_aliases")

  private def mentionsOf(text: String, analyzer: String, label: String = "Vanuatu") = {
    val keys = DictBuild.dictKeys(dictOf(label), analyzer)
    Mentions.extract(Seq((0L, text)).toDF("doc_id", "text"),
      keys, maxN = 1, analyzer = analyzer)
      .select("start", "end", "surface").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
  }

  test("affiliations profile matches mixed-case mentions; tapioca does not") {
    val text = "I live in VANUATU"
    assert(mentionsOf(text, "affiliations") === Set((10, 17, "VANUATU")))
    assert(mentionsOf(text, "tapioca") === Set.empty)
    // exact-case matches under both chains
    val exact = "I live in Vanuatu"
    assert(mentionsOf(exact, "affiliations") === Set((10, 17, "Vanuatu")))
    assert(mentionsOf(exact, "tapioca") === Set((10, 17, "Vanuatu")))
  }

  test("affiliations dictionary keys are lowercased at build time") {
    val keys = DictBuild.dictKeys(dictOf("Vanuatu"), "affiliations")
      .select("norm_key").as[String].collect().toSet
    assert(keys === Set("vanuatu"))
  }

  test("twitter chain keeps @handles as one lowercased token end-to-end") {
    val keys = DictBuild.dictKeys(dictOf("@WikiData"), "twitter")
    val hits = Mentions.extract(
      Seq((0L, "follow @wikidata today")).toDF("doc_id", "text"),
      keys, maxN = 1, analyzer = "twitter")
      .select("start", "end", "surface").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(hits === Set((7, 16, "@wikidata")))
  }
}
