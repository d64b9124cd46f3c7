package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit hot-key salting for skewed equi-joins (north_rule: "hot alias
  * keys salted and AQE skew-join splitting to survive Zipfian web-mention
  * skew").
  *
  * AQE's OptimizeSkewedJoin splits oversized SHUFFLE PARTITIONS after the
  * map stage runs, which rescues most skew — but a single Zipf-hot key
  * (one surface form appearing in a large fraction of all pages) still
  * hashes every one of its rows to ONE reducer before AQE can act, and the
  * engine's pinned shuffle-hash joins bypass the sort-merge-only split in
  * some Spark versions. Salting removes the hot key from the hash-bucket
  * equation up front: fact rows of a hot key scatter over `salts` shuffle
  * partitions, and only the (small) dim rows of hot keys are replicated
  * `salts` ways — cold keys pay nothing.
  *
  * The transformation is result-exact for an inner equi-join regardless of
  * how fact rows are assigned to salts: each fact row carries exactly one
  * salt and meets exactly one replica of its key's dim rows. The salt here
  * is a content hash of the fact row (codegen'd xxhash64), so the plan is
  * also deterministic under task retries.
  */
object SaltedJoin {

  /** Hot keys of `fact(key)` estimated from a seeded sample: keys whose
    * estimated row count exceeds `hotThreshold`. Collected to the driver —
    * by construction only keys with >hotThreshold rows qualify, so the
    * result has at most rows(fact)/hotThreshold entries (a handful at any
    * scale worth salting). */
  def hotKeys(fact: DataFrame, key: String, hotThreshold: Long,
      sampleFraction: Double = 0.01, seed: Long = 7L): Seq[String] =
    fact.sample(withReplacement = false, sampleFraction, seed)
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(math.max(1.0, hotThreshold * sampleFraction)))
      .select(col(key).cast("string"))
      .collect().map(_.getString(0)).toSeq.sorted

  /** Inner equi-join of `fact` (large, Zipf-skewed on `key`) with `dim`
    * (small enough to replicate its HOT rows `salts` ways) — exact same
    * rows as `fact.join(dim, Seq(key))`, with hot keys spread over `salts`
    * shuffle partitions. `hot` defaults to the sampled estimate; pass it
    * explicitly when key frequencies are known upstream (e.g. dictionary
    * document frequencies). */
  def join(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16, hotThreshold: Long = 500000L,
      hot: Option[Seq[String]] = None): DataFrame = {
    require(salts > 1, s"salts must be > 1 (got $salts)")
    val hk = hot.getOrElse(hotKeys(fact, key, hotThreshold))
    if (hk.isEmpty) return fact.join(dim, Seq(key))
    // membership via isin, not array_contains: Catalyst rewrites In to a
    // hash-set InSet past 10 items, so a forced-large hot list (tests,
    // saltHotThreshold=1) stays O(1) per row instead of O(|hot|)
    val isHot = col(key).cast("string").isin(hk: _*)
    // content-derived salt: deterministic under retries; any per-row
    // assignment is correct (one salt per fact row, dim replicated to all)
    val factSalt = when(isHot,
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salts.toLong)))
      .otherwise(lit(0L))
    val f = fact.withColumn("__salt", factSalt)
    val dimHot = dim.filter(isHot)
      .withColumn("__salt", explode(typedLit((0 until salts).map(_.toLong))))
    val dimCold = dim.filter(!isHot).withColumn("__salt", lit(0L))
    f.join(dimHot.unionByName(dimCold), Seq(key, "__salt")).drop("__salt")
  }
}
