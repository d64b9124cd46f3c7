package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

class TextOpsSpec extends AnyFunSuite {

  // golden: tests/test_languagemodel.py:6-7
  test("bow tokenize splits on separator regex") {
    assert(TextOps.bowTokenize("invited speakers") == List("invited", "speakers"))
    assert(TextOps.bowTokenize("hello, world") == List("hello", "world"))
    assert(TextOps.bowTokenize("a-b c/d e:f") == List("a-b", "c/d", "e:f"))
    // separator = punct adjacent to a SPACE; flanking punctuation absorbed
    assert(TextOps.bowTokenize("x, (y") == List("x", "y"))
    assert(TextOps.bowTokenize("") == Nil)
    assert(TextOps.bowTokenize("Aimée Müller") == List("Aimee", "Muller"))
  }

  // golden: truth table from tests/test_tagger.py:57-62
  test("prune phrase truth table") {
    assert(TextOps.prunePhrase("of"))
    assert(TextOps.prunePhrase("1 1"))
    assert(TextOps.prunePhrase("a"))
    assert(!TextOps.prunePhrase("orcid"))
    assert(!TextOps.prunePhrase("75005")) // 5 digits: too long for [\d ]{0,4}
    assert(!TextOps.prunePhrase("UK")) // uppercase
    assert(!TextOps.prunePhrase("hash join"))
    assert(TextOps.prunePhrase("12 4"))
  }

  test("possessive strip + ascii fold") {
    assert(TextOps.stripPossessive("company's") == "company")
    assert(TextOps.stripPossessive("its") == "its") // only 's as suffix token
    assert(TextOps.normToken("Zürich's") == "Zurich")
    assert(TextOps.asciiFold("Ångström") == "Angstrom")
    assert(TextOps.unidecode("œuvre") == "oeuvre")
  }

  test("tokenize with offsets: offset integrity") {
    val text = "the fast key order sort table scan"
    val toks = TextOps.tokenizeWithOffsets(text)
    assert(toks.map(_.raw) == Seq("the", "fast", "key", "order", "sort", "table", "scan"))
    toks.foreach(t => assert(text.substring(t.start, t.end) == t.raw))
  }

  test("ngram spans cover all lengths with exact offsets") {
    val text = "hash join order"
    val spans = TextOps.ngramSpans(text, 3)
    assert(spans.map(s => (s.key, s.start, s.end)).toSet == Set(
      ("hash", 0, 4), ("hash join", 0, 9), ("hash join order", 0, 15),
      ("join", 5, 9), ("join order", 5, 15),
      ("order", 10, 15)))
  }

  test("property: every ngram span substring matches its key (seeded corpus)") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("join", "hash", "scan", "merge", "a", "the", "sort's", "Zürich")
    for (_ <- 0 until 200) {
      val text = Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      TextOps.ngramSpans(text, 3).foreach { s =>
        val raw = text.substring(s.start, s.end)
        val renorm = TextOps.tokenizeWithOffsets(raw).map(_.norm).mkString(" ")
        assert(renorm == s.key, s"text=[$text] span=$s")
      }
    }
  }

  test("analyzer variants: tapioca case-sensitive, affiliations lowercase, twitter @#") {
    import graft.text.TextOps
    // tapioca (managed-schema:63-75): NO lowercase
    assert(TextOps.tokenizeWithOffsetsFor("tapioca", "IBM's Café").map(_.norm) ==
      Seq("IBM", "Cafe"))
    // affiliations (managed-schema:63-77): lowercase after fold
    assert(TextOps.tokenizeWithOffsetsFor("affiliations", "IBM's Café").map(_.norm) ==
      Seq("ibm", "cafe"))
    // twitter: @mentions/#hashtags survive as single lowercase tokens
    val tw = TextOps.tokenizeWithOffsetsFor("twitter", "@OpenTapioca rocks #NLP")
    assert(tw.map(_.norm) == Seq("@opentapioca", "rocks", "#nlp"))
    assert(tw.map(t => (t.start, t.end)) == Seq((0, 12), (13, 18), (19, 23)))
  }
}
