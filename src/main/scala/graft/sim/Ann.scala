package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (array<float>).
  *
  *  - brute-force cosine top-k: exact baseline; query set x corpus as a
  *    broadcast nested-loop of the (small) query side against the corpus
  *    scan — linear in corpus size, no shuffle until the per-query top-k;
  *  - LSH-bucketed variant (random hyperplane signs): the scale path —
  *    candidate generation becomes an equi-join on the signature bucket,
  *    then exact re-ranking within buckets only.
  *
  * Vector math runs through native codegen'd Catalyst expressions
  * (graft.functions.VectorOps): round 2 used zip_with/aggregate
  * higher-order functions, but Catalyst evaluates lambda HOFs interpreted
  * per element, which made dd_embed the slowest query in the suite. The
  * HOF formulations are kept below as the differential-test oracle
  * (VectorOpsSpec pins them bit-equal).
  */
object Ann {

  /** cosine similarity of two array<double> columns (codegen'd kernel). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorOps.cosineSim(a, b)

  /** Reference HOF formulation of cosine (interpreted; test oracle only). */
  private[graft] def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = transform(c, v => v.cast("double"))

  /** exact brute-force cosine top-k: every query vector (vec_id % queryMod
    * == 0) against the full corpus. */
  def bruteForceTopK(embeddings: DataFrame, k: Int = 5, queryMod: Int = 100): DataFrame = {
    val corpus = embeddings.select(col("vec_id").as("cand_id"),
      asDouble(col("embedding")).as("cand_vec"))
    val queries = embeddings.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("query_vec"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("query_vec"), col("cand_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 6).as("cos"),
        col("rk").cast("int").as("rk"))
  }

  /** deterministic pseudo-random hyperplane component h(plane, dim):
    * a fixed portable integer stream mapped to {-1, +1}. */
  private def planeSign(plane: Int, dim: Column): Column = {
    val p = graft.dedup.Dedup.P
    when(((lit(plane + 1L) * lit(2654435761L) + lit(97L) * dim) % lit(p)) % 2 === 1,
      lit(1.0)).otherwise(lit(-1.0))
  }

  /** random-hyperplane LSH signature: bit b = sign(sum_i v_i * s(b, i))
    * (codegen'd kernel, same sign stream as planeSign). */
  def lshSignature(vec: Column, planes: Int): Column =
    graft.functions.VectorOps.rhpSig(vec, planes)

  /** Reference HOF formulation of the signature (test oracle only). */
  private[graft] def lshSignatureHof(vec: Column, planes: Int): Column = {
    (0 until planes).map { b =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v * planeSign(b, i.cast("long"))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Deterministic near-dup plants for the embeddings table (the synthetic
    * corpus has no natural near-identical vectors): every 100th vector gets
    * a scaled copy (x1.5, float-exact in both engines), id +10^6 — same LSH
    * bucket, cosine = 1.0. Mirrors Dedup.augment for text. */
  def augmentEmbeddings(embeddings: DataFrame): DataFrame = {
    val variant = embeddings.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        expr("transform(embedding, v -> cast(v * cast(1.5 as float) as float))")
          .as("embedding"))
    embeddings.select(col("vec_id"), col("embedding")).unionByName(variant)
  }

  /** Embedding-cosine near-duplicate detection: LSH-bucketed candidate
    * generation + exact cosine verify >= threshold — the embedding
    * analogue of minhash+LSH+jaccard-verify. Linear shuffle on the bucket
    * key, no all-pairs scan. */
  def embedNearDups(embeddings: DataFrame, threshold: Double = 0.9,
      planes: Int = 8): DataFrame = {
    val withSig = embeddings.select(col("vec_id"),
      asDouble(col("embedding")).as("vec"))
      .withColumn("sig", lshSignature(col("vec"), planes))
    val a = withSig.select(col("vec_id").as("id1"), col("vec").as("v1"), col("sig"))
    val b = withSig.select(col("vec_id").as("id2"), col("vec").as("v2"),
      col("sig").as("sig2"))
    a.join(b, col("sig") === col("sig2") && col("id1") < col("id2"))
      .withColumn("cos_raw", cosine(col("v1"), col("v2")))
      .filter(col("cos_raw") >= lit(threshold))
      .select(col("id1"), col("id2"), round(col("cos_raw"), 6).as("cos"))
  }

  /** IVF (inverted-file) ANN: coarse-quantize the corpus into `numCells`
    * cells around deterministic centroids, then search only the `nprobe`
    * cells nearest each query — the third point on the exactness/cost
    * curve after brute force (exact, linear per query) and LSH (cheap,
    * recall limited by signature collisions).
    *
    * Centroids are the `numCells` lowest-id vectors (k-means init without
    * Lloyd rounds, so the DuckDB oracle derives the identical cells; a
    * deployment would swap in trained centroids — every downstream shape
    * is unchanged).
    *
    * Scale path: the centroid table is tiny and BROADCAST, so cell
    * assignment is a scan-local nested loop (K cosines per row) whose
    * argmax folds MAP-SIDE (groupBy+max partial aggregation — the shuffle
    * carries one row per vector, never K); the candidate join shuffles on
    * the CELL id only, touching ~nprobe/numCells of the corpus per query. */
  def ivfTopK(embeddings: DataFrame, k: Int = 5, queryMod: Int = 100,
      numCells: Int = 16, nprobe: Int = 4): DataFrame = {
    val emb = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    // Deterministic centroids (numCells lowest-id vectors) COLLECTED once —
    // bounded by numCells, the same driver-side pattern as SaltedJoin's hot
    // keys — and inlined as literals. The previous formulation crossJoined a
    // broadcast centroid frame and took max(struct(ccos, -cid, vec)): a
    // struct-with-array max compiles to SortAggregate, so the whole corpus
    // (vectors included) rode an Exchange + two Sorts just to pick each
    // row's nearest cell. Inline literals make cell assignment a pure
    // codegen projection: K cosines + greatest(), NO exchange (guide §2.4).
    val centArr: Seq[(Int, Seq[Double])] =
      emb.orderBy(col("vec_id")).limit(numCells).collect()
        .zipWithIndex
        .map { case (r, i) => (i, r.getAs[scala.collection.Seq[Double]]("vec").toSeq) }
        .toSeq

    // argmax cell per vector: greatest over structs orders by (cosine,
    // -cid), so ties break toward the lower cell id — same ordering the
    // oracle's row_number() uses
    val best = greatest(centArr.map { case (cid, cvec) =>
      struct(cosine(col("vec"), typedLit(cvec)).as("ccos"),
        lit(-cid).as("ncid"))
    }: _*)
    val assigned = emb.select(col("vec_id").as("cand_id"),
      (-best.getField("ncid")).as("cid"), col("vec").as("cand_vec"))

    // top-nprobe cells per query: ascending struct sort on (ccos, -cid)
    // then reverse = (ccos desc, cid asc) — the window ordering the oracle
    // uses, without the crossJoin + window pass of the previous plan
    val cellArr = array(centArr.map { case (cid, cvec) =>
      struct(cosine(col("query_vec"), typedLit(cvec)).as("ccos"),
        lit(-cid).as("ncid"))
    }: _*)
    val probes = emb.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("vec").as("query_vec"))
      .select(col("query_id"), col("query_vec"),
        explode(slice(reverse(array_sort(cellArr)), 1, nprobe)).as("pc"))
      .select(col("query_id"), col("query_vec"),
        (-col("pc.ncid")).as("cid"))

    val scored = assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("query_vec"), col("cand_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 6).as("cos"),
        col("rk").cast("int").as("rk"))
  }

  /** LSH-bucketed ANN: signature equi-join for candidates, exact cosine
    * re-rank inside buckets. Scale path: shuffle on the bucket key only. */
  def lshTopK(embeddings: DataFrame, k: Int = 5, queryMod: Int = 100,
      planes: Int = 8): DataFrame = {
    val withSig = embeddings.select(col("vec_id"),
      asDouble(col("embedding")).as("vec"))
      .withColumn("sig", lshSignature(col("vec"), planes))
    val corpus = withSig.select(col("vec_id").as("cand_id"),
      col("vec").as("cand_vec"), col("sig"))
    val queries = withSig.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), col("vec").as("query_vec"),
        col("sig").as("qsig"))
    val scored = corpus.join(broadcast(queries), col("sig") === col("qsig") &&
        col("cand_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("query_vec"), col("cand_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 6).as("cos"),
        col("rk").cast("int").as("rk"))
  }
}
