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
}
