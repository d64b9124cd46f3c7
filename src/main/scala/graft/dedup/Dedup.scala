package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Large-scale training-data deduplication suite over the `documents` table.
  *
  * Every operator here is expressed so that an independent DuckDB oracle can
  * recompute it: hash functions are portable integer arithmetic over a
  * deterministic global word-rank table (dense ranks of the corpus
  * vocabulary), not engine-native hash() calls.
  *
  * Scale notes: exact dedup is one hash aggregation; MinHash signatures are
  * per-row (no shuffle) after one broadcast join against the vocabulary;
  * LSH banding turns near-dup discovery into an equi-join on (band, bucket
  * key) — linear shuffle, no quadratic pair scan; SimHash is a per-row
  * fold. All are the standard web-scale constructions (Broder 1997 /
  * Charikar 2002).
  */
object Dedup {

  // portable 31-bit modulus for hash arithmetic (fits exactly in doubles
  // and BIGINTs on both engines)
  val P = 2147483647L // 2^31 - 1

  /** deterministic global word ids: dense_rank over the sorted distinct
    * vocabulary of the corpus. Broadcastable (vocabulary ≪ corpus). */
  def wordRanks(docs: DataFrame): DataFrame = {
    docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .withColumn("wid", row_number().over(Window.orderBy(col("word"))).cast("long"))
  }

  /** Exact duplicate groups: group by full text (hash aggregate), keep
    * groups of size > 1, expose (doc_id, dup_group = min doc_id, group
    * size). */
  def exactDups(docs: DataFrame): DataFrame = {
    val groups = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("dup_group"), count(lit(1)).as("group_size"))
      .filter(col("group_size") > 1)
    docs.join(groups, Seq("text"))
      .select(col("doc_id"), col("dup_group"), col("group_size").cast("long"))
  }

  /** doc -> distinct word ids (the set representation for Jaccard). */
  private def docWordIds(docs: DataFrame, ranks: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("word"))
      .filter(length(col("word")) > 0)
      .join(broadcast(ranks), Seq("word"))
      .select(col("doc_id"), col("wid"))

  /** MinHash signatures: minhash_i(doc) = min over words of
    * (a_i * wid + b_i) mod P, with deterministic (a_i, b_i) streams.
    * One row per (doc, i). */
  def minhashSignatures(docs: DataFrame, ranks: DataFrame, numHashes: Int): DataFrame = {
    val ids = docWordIds(docs, ranks)
    val hashes = (0 until numHashes).map { i =>
      val a = 1L + 37L * i
      val b = 11L + 17L * i
      min((lit(a) * col("wid") + lit(b)) % lit(P)).as(s"mh_$i")
    }
    val sig = ids.groupBy(col("doc_id")).agg(hashes.head, hashes.tail: _*)
    // unpivot to (doc_id, h, value)
    val stacked = (0 until numHashes).map(i =>
      struct(lit(i).as("h"), col(s"mh_$i").as("v")))
    sig.select(col("doc_id"), explode(array(stacked: _*)).as("s"))
      .select(col("doc_id"), col("s.h").as("h"), col("s.v").as("v"))
  }

  /** LSH banding: band b = hashes [b*rowsPerBand, (b+1)*rowsPerBand);
    * bucket key = sum of v * 31^row mod P. Candidate pairs = docs sharing
    * any (band, bucket). */
  def minhashCandidates(docs: DataFrame, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val ranks = wordRanks(docs)
    val sig = minhashSignatures(docs, ranks, numHashes)
    val banded = sig
      .withColumn("band", (col("h") / lit(rows)).cast("int"))
      .withColumn("pw", pow(lit(31.0), (col("h") % lit(rows)).cast("double")).cast("long"))
      .groupBy(col("doc_id"), col("band"))
      .agg((sum(col("v") * col("pw")) % lit(P)).as("bucket"))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc1"))
    val b = banded.select(col("band").as("band2"), col("bucket").as("bucket2"),
      col("doc_id").as("doc2"))
    a.join(b, col("band") === col("band2") && col("bucket") === col("bucket2") &&
        col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2"))
      .distinct()
  }

  /** SimHash-64 fingerprint: per word-id bit b = (wid * C1 + C2 * (b+1))
    * mod P mod 2 (a portable deterministic bit stream); fingerprint bit =
    * majority sign. Computed per row with bounded bit width. */
  def simhash(docs: DataFrame, ranks: DataFrame, bits: Int = 16): DataFrame = {
    val ids = docWordIds(docs, ranks)
    val bitCols = (0 until bits).map { b =>
      sum(when(((col("wid") * lit(2654435761L) + lit(40503L) * lit(b + 1)) % lit(P)) % 2 === 1,
        lit(1)).otherwise(lit(-1))).as(s"bit_$b")
    }
    val agg = ids.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val fp = (0 until bits).map { b =>
      when(col(s"bit_$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((x, y) => x + y)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** Token-shingle Jaccard similarity for candidate pairs (exact verify step
    * after LSH): |A ∩ B| / |A ∪ B| over distinct word sets. */
  def jaccardVerify(docs: DataFrame, pairs: DataFrame, threshold: Double): DataFrame = {
    val ranks = wordRanks(docs)
    val ids = docWordIds(docs, ranks)
    val sizes = ids.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = ids.select(col("doc_id").as("doc1"), col("wid"))
    val b = ids.select(col("doc_id").as("doc2"), col("wid"))
    val inter = pairs.join(a, Seq("doc1")).join(b, Seq("doc2", "wid"))
      .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("sz", "sz1"), Seq("doc1"))
      .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("sz", "sz2"), Seq("doc2"))
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (col("sz1") + col("sz2") - col("common")).cast("double"), 6))
      .filter(col("jaccard") >= lit(threshold))
      .select(col("doc1"), col("doc2"), col("jaccard"))
  }
}
