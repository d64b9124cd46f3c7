package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SC}
import org.scalacheck.rng.Seed
import graft.functions.JaroWinkler
import graft.text.TextOps

/** Property-based differentials for the pure-JVM kernels on the hot paths.
  * Golden tests pin known answers; these pin the ALGEBRA over thousands of
  * random inputs — symmetry/range/idempotence, an independently re-derived
  * Jaro-Winkler implementation, and the construction invariant of the
  * round-5 first-token prefilter (filtered span stream == unfiltered
  * stream restricted to accepted start positions, so the dictionary join
  * result is provably unchanged). Raw scalacheck (no scalatest bridge in
  * the offline cache); fixed seed for reproducibility. */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 500): Unit = {
    val params = SC.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(Seed(0xA11CE5EEDL))
    val res = SC.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // ---- generators -------------------------------------------------------

  /** Small alphabets force matches, transpositions and shared prefixes —
    * the regions where a Jaro-Winkler bug would hide. */
  private val tinyWord: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)

  private val asciiWord: Gen[String] =
    Gen.chooseNum(0, 16).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar))
      .map(_.mkString)

  /** Web-text-ish fragments: vocab words, unicode (folded and unfoldable),
    * digits, possessives, punctuation separators. */
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.oneOf("Paris", "café", "Müller", "O'Brien", "naïve", "12",
      "données", "Δelta", "ŒUF", "ligne's", "a", "@user", "#tag", "東京"),
    asciiWord)

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    words <- Gen.listOfN(n, fragment)
    seps <- Gen.listOfN(n, Gen.oneOf(" ", ", ", " - ", "; ", ". ", " ("))
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  // ---- independent Jaro-Winkler re-derivation (textbook definition) ----

  private def refJaro(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val bUsed = Array.fill(b.length)(false)
    val aMatched = new StringBuilder
    val bIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- a.indices) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = -1
      while (j <= hi && found < 0) {
        if (!bUsed(j) && b.charAt(j) == a.charAt(i)) found = j
        j += 1
      }
      if (found >= 0) { bUsed(found) = true; aMatched.append(a.charAt(i)); bIdx += found }
    }
    val m = aMatched.length
    if (m == 0) return 0.0
    val bMatched = bIdx.sorted.map(b.charAt).mkString
    // strcmp95/DuckDB convention: transpositions = FLOOR(mismatched
    // aligned pairs / 2) — the oracle-compatible halving the production
    // expression documents (JaroWinkler.scala:82-85)
    val t = aMatched.toString.zip(bMatched).count { case (x, y) => x != y } / 2
    (m.toDouble / a.length + m.toDouble / b.length + (m - t).toDouble / m) / 3.0
  }

  private def refJw(a: String, b: String): Double = {
    val j = refJaro(a, b)
    if (j > JaroWinkler.BoostThreshold) {
      val l = a.zip(b).take(JaroWinkler.MaxPrefix)
        .takeWhile { case (x, y) => x == y }.size
      j + l * JaroWinkler.PrefixScale * (1 - j)
    } else j
  }

  test("jaro-winkler matches an independent textbook re-derivation") {
    check("jw-ref", Prop.forAll(tinyWord, tinyWord) { (a, b) =>
      math.abs(JaroWinkler.similarity(a, b) - refJw(a, b)) < 1e-12
    }, n = 2000)
  }

  test("jaro-winkler algebra: symmetry, range, identity") {
    check("jw-sym", Prop.forAll(asciiWord, asciiWord) { (a, b) =>
      val s = JaroWinkler.similarity(a, b)
      s == JaroWinkler.similarity(b, a) && s >= 0.0 && s <= 1.0
    }, n = 1000)
    check("jw-id", Prop.forAll(asciiWord) { a =>
      JaroWinkler.similarity(a, a) == 1.0
    })
  }

  // ---- fold / transliteration ------------------------------------------

  test("unidecode emits pure ASCII, is idempotent, identity on ASCII") {
    check("unidecode", Prop.forAll(textGen) { s =>
      val u = TextOps.unidecode(s)
      u.forall(_ < 128) && TextOps.unidecode(u) == u &&
        (!s.forall(_ < 128) || u == s)
    }, n = 1000)
  }

  test("asciiFold is idempotent and identity on ASCII") {
    check("fold", Prop.forAll(textGen) { s =>
      val f = TextOps.asciiFold(s)
      TextOps.asciiFold(f) == f && (!s.forall(_ < 128) || f == s)
    }, n = 1000)
  }

  // ---- tokenizer offset contract (all three analyzer variants) ---------

  test("token offsets index the raw surface and never overlap") {
    val analyzers = Gen.oneOf("tapioca", "affiliations", "twitter")
    check("offsets", Prop.forAll(analyzers, textGen) { (an, text) =>
      val toks = TextOps.tokenizeWithOffsetsFor(an, text)
      toks.forall(t => text.substring(t.start, t.end) == t.raw) &&
        toks.sliding(2).forall {
          case Seq(x, y) => x.end <= y.start
          case _ => true
        }
    }, n = 1000)
  }

  // ---- first-token prefilter construction invariant --------------------

  test("prefilter == unfiltered spans restricted to accepted start tokens") {
    val gen = for {
      an <- Gen.oneOf("tapioca", "affiliations", "twitter")
      text <- textGen
      maxN <- Gen.chooseNum(1, 4)
      keepBits <- Gen.listOfN(24, Gen.oneOf(true, false))
    } yield (an, text, maxN, keepBits)
    check("prefilter", Prop.forAll(gen) { case (an, text, maxN, keepBits) =>
      val toks = TextOps.tokenizeWithOffsetsFor(an, text)
      // accept a pseudo-random subset of the text's own norms (so the
      // filter both accepts and rejects real positions), never by chance
      // everything or nothing only
      val norms = toks.map(_.norm).distinct
      val accepted = norms.zipWithIndex
        .collect { case (w, i) if keepBits(i % keepBits.length) => w }.toSet
      val startNorm = toks.map(t => t.start -> t.norm).toMap
      val unfiltered = TextOps.ngramSpansFor(an, text, maxN)
      val expected = unfiltered.filter(sp => accepted(startNorm(sp.start)))
      val actual = TextOps.ngramSpansFor(an, text, maxN, accepted.contains)
      actual == expected
    }, n = 1000)
    // accept-all filter is exactly the null filter
    check("prefilter-all", Prop.forAll(textGen) { text =>
      TextOps.ngramSpansFor("tapioca", text, 3, _ => true) ==
        TextOps.ngramSpansFor("tapioca", text, 3)
    })
  }

  // ---- vector kernels (dd_embed / ann_* hot path) -----------------------

  private val vecGen: Gen[Array[Double]] = for {
    n <- Gen.chooseNum(1, 16)
    xs <- Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 100.0))
  } yield {
    val a = xs.toArray
    if (a.forall(_ == 0.0)) a(0) = 1.0 // cosine is undefined on zero vectors
    a
  }

  test("cosine algebra: symmetry, range, self-similarity, scale invariance") {
    import graft.functions.VectorOps.cosine
    check("cos-sym", Prop.forAll(vecGen, vecGen) { (a, b) =>
      cosine(a, b) == cosine(b, a) && math.abs(cosine(a, b)) <= 1.0 + 1e-9
    }, n = 1000)
    check("cos-self", Prop.forAll(vecGen) { a =>
      math.abs(cosine(a, a) - 1.0) < 1e-12
    })
    check("cos-scale", Prop.forAll(vecGen, vecGen,
        Gen.chooseNum(1, 1000).map(_ / 100.0)) { (a, b, k) =>
      math.abs(cosine(a.map(_ * k), b) - cosine(a, b)) < 1e-9
    }, n = 1000)
  }

  test("rhp signature: positive-scale invariant, width-bounded, deterministic") {
    import graft.functions.VectorOps.rhpSignature
    val gen = for {
      v <- vecGen
      planes <- Gen.chooseNum(1, 32)
      k <- Gen.chooseNum(1, 1000).map(_ / 100.0)
    } yield (v, planes, k)
    check("rhp", Prop.forAll(gen) { case (v, planes, k) =>
      val sig = rhpSignature(v, planes)
      // sign(proj) is invariant under positive scaling, so an exact or
      // positively-scaled duplicate ALWAYS lands in the same LSH bucket —
      // the deterministic half of the dd_embed recall guarantee
      sig == rhpSignature(v.map(_ * k), planes) &&
        (sig >>> planes) == 0L &&
        sig == rhpSignature(v.clone(), planes)
    }, n = 1000)
  }

  // ---- prune filter: the length shortcut never changes the answer ------

  test("prunePhrase equals the spec regex without the length shortcut") {
    val spec = java.util.regex.Pattern.compile("(?U)^(\\w\\w?|[\\d ]{0,4})$")
    val phraseGen = Gen.oneOf(
      textGen,
      Gen.chooseNum(0, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('1', '7', ' ', 'a', 'B', 'é')).map(_.mkString)))
    check("prune", Prop.forAll(phraseGen) { s =>
      TextOps.prunePhrase(s) ==
        (spec.matcher(s).matches() && s == s.toLowerCase)
    }, n = 2000)
  }
}
