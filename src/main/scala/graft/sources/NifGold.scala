package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NIF gold-annotation scan (classifier.py:184-195; the reference's data
  * dir TTL corpora + tests/data/five-affiliations.ttl): reads a NIF/Turtle
  * collection into
  * two DataFrames — contexts (document texts) and gold phrase annotations.
  *
  * The reference parses these with pynif; the files are the regular
  * output of NIFCollection.dump (one `subject ... .` statement block per
  * context/phrase, `\n\n`-separated), so a deterministic block parser over
  * a distributed wholetext scan is exact for this corpus family. Each TTL
  * file is one partition's worth of driver-side-free parsing; corpora are
  * many small files, which is the parallel unit.
  */
object NifGold {

  final case class Context(doc_uri: String, text: String)
  final case class GoldMention(doc_uri: String, begin: Int, end: Int,
      surface: String, qid: String)

  // ("""|") — a Turtle literal opens with one or three double quotes
  private val Quotes = "(\"\"\"|\")"
  private val AnchorRe = ("(?s)nif:anchorOf\\s+" + Quotes + "(.*?)\\1\\s*[;.]").r
  private val BeginRe = "nif:beginIndex\\s+\"(\\d+)\"".r
  private val EndRe = "nif:endIndex\\s+\"(\\d+)\"".r
  private val CtxRe = "nif:referenceContext\\s+<([^>]+)>".r
  private val IdentRe = "itsrdf:taIdentRef\\s+<[^>]*/([QP]\\d+)>".r
  private val IsStringRe = ("(?s)nif:isString\\s+" + Quotes + "(.*?)\\1\\s*[;.]").r
  private val SubjectRe = "(?s)^<([^>]+)>\\s+a\\s".r

  /** Single left-to-right scan: sequential replace() calls re-interpret
    * the output of earlier ones (an escaped backslash followed by 'n'
    * would decode to a newline), so escapes are consumed in one pass. */
  private def unescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => out.append('"'); i += 2
          case 'n' => out.append('\n'); i += 2
          case 't' => out.append('\t'); i += 2
          case '\\' => out.append('\\'); i += 2
          case other => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Parse one TTL file's content into (contexts, mentions). */
  private[graft] def parseTtl(content: String): (Seq[Context], Seq[GoldMention]) = {
    val blocks = content.split("\n\\s*\n").toSeq
    val contexts = Seq.newBuilder[Context]
    val mentions = Seq.newBuilder[GoldMention]
    blocks.foreach { b =>
      val subject = SubjectRe.findFirstMatchIn(b).map(_.group(1))
      if (subject.nonEmpty && b.contains("nif:Context") && b.contains("nif:isString")) {
        IsStringRe.findFirstMatchIn(b).foreach { m =>
          contexts += Context(subject.get, unescape(m.group(2)))
        }
      } else if (b.contains("nif:Phrase")) {
        for {
          a <- AnchorRe.findFirstMatchIn(b)
          s <- BeginRe.findFirstMatchIn(b)
          e <- EndRe.findFirstMatchIn(b)
          c <- CtxRe.findFirstMatchIn(b)
          q <- IdentRe.findFirstMatchIn(b)
        } mentions += GoldMention(c.group(1), s.group(1).toInt, e.group(1).toInt,
          unescape(a.group(2)), q.group(1))
      }
    }
    (contexts.result(), mentions.result())
  }

  /** Distributed scan: one row per file via wholetext, parsed per-partition. */
  private def readFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(path).toDF("content")
  }

  /** (doc_uri, text) context documents of a NIF collection. */
  def contexts(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readFiles(spark, path).as[String]
      .flatMap(c => parseTtl(c)._1)
      .toDF()
  }

  /** (doc_uri, begin, end, surface, qid) gold annotations. */
  def goldMentions(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    readFiles(spark, path).as[String]
      .flatMap(c => parseTtl(c)._2)
      .toDF()
  }

  /** Driver-checkable demo of the NIF scan: stages a deterministic two-file
    * synthetic Turtle corpus (escape sequences \" \n \t \\ exercised in the
    * context literals so the single-pass decoder is load-bearing), runs the
    * production contexts/goldMentions readers over it, and emits one row per
    * gold mention joined to its context with an offset-consistency flag.
    * The DuckDB oracle re-derives the decoded texts independently via SQL
    * e-string escapes and the offsets via strpos (Oracles.elNifSql), so a
    * mis-decoded escape or off-by-one offset cannot hash-match. */
  def syntheticDemo(spark: SparkSession): DataFrame = {
    val ttl1 =
      """@prefix nif: <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#> .
        |@prefix itsrdf: <http://www.w3.org/2005/11/its/rdf#> .
        |
        |<http://graft.test/doc1> a nif:Context ;
        |  nif:isString "Said \"hello\" to Ada Lovelace\nin Paris." .
        |
        |<http://graft.test/doc1#offset_16_28> a nif:Phrase ;
        |  nif:anchorOf "Ada Lovelace" ;
        |  nif:beginIndex "16" ;
        |  nif:endIndex "28" ;
        |  nif:referenceContext <http://graft.test/doc1> ;
        |  itsrdf:taIdentRef <http://www.wikidata.org/entity/Q7259> .
        |
        |<http://graft.test/doc1#offset_32_37> a nif:Phrase ;
        |  nif:anchorOf "Paris" ;
        |  nif:beginIndex "32" ;
        |  nif:endIndex "37" ;
        |  nif:referenceContext <http://graft.test/doc1> ;
        |  itsrdf:taIdentRef <http://www.wikidata.org/entity/Q90> .
        |""".stripMargin
    val ttl2 =
      """@prefix nif: <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#> .
        |@prefix itsrdf: <http://www.w3.org/2005/11/its/rdf#> .
        |
        |<http://graft.test/doc2> a nif:Context ;
        |  nif:isString "Tabs\there and C:\\path meet Alan Turing." .
        |
        |<http://graft.test/doc2#offset_27_38> a nif:Phrase ;
        |  nif:anchorOf "Alan Turing" ;
        |  nif:beginIndex "27" ;
        |  nif:endIndex "38" ;
        |  nif:referenceContext <http://graft.test/doc2> ;
        |  itsrdf:taIdentRef <http://www.wikidata.org/entity/Q7251> .
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft_nif_demo")
    Seq("a.ttl" -> ttl1, "b.ttl" -> ttl2).foreach { case (name, content) =>
      val f = dir.resolve(name)
      java.nio.file.Files.write(f, content.getBytes("UTF-8"))
      f.toFile.deleteOnExit()
    }
    dir.toFile.deleteOnExit()
    val ctx = contexts(spark, dir.toString)
    val men = goldMentions(spark, dir.toString)
    men.join(ctx, "doc_uri").select(
      col("doc_uri"),
      col("begin").as("m_begin"),
      col("end").as("m_end"),
      col("surface"), col("qid"),
      length(col("text")).as("ctx_len"),
      expr("substring(text, `begin` + 1, `end` - `begin`)").equalTo(col("surface"))
        .as("anchor_ok"))
  }
}
