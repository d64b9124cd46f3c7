package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface of the engine.
  *
  * The reference's only streaming workload is the stateless edit-stream
  * upsert (readers/streamreader.py:16-71, no windows/watermarks). We keep
  * that (dictUpserts: foreachBatch merge) and additionally expose a
  * watermarked event-time windowed aggregation over the `events` table —
  * the canonical Structured Streaming pattern a production pipeline needs.
  * Tests drive both from the parquet file source with
  * `processAllAvailable()` so results are deterministic and batch-checkable.
  */
object EventStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Run `body` with spark.sql.shuffle.partitions temporarily lowered to
    * `n`: a streaming query's state-store partition count is pinned by
    * this setting at its first checkpoint, and the per-partition fixed
    * costs (provider init, per-batch commit, one sink file per partition)
    * dominate these bounded driver-contract streams — measured 2-4x wall
    * on the stream_* queries at 64 partitions vs 8 for identical results.
    * On a real cluster with an unbounded stream you size this UP; the
    * restore in `finally` keeps the session's batch queries untouched. */
  private def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, old)
  }

  /** Tumbling 1-hour windowed counts/sums per event type with a 1-hour
    * watermark, executed as a streaming query into a memory sink and
    * returned as a batch DataFrame (complete mode => equals the batch
    * aggregation over the same files, which is the DuckDB oracle). */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame =
      withShufflePartitions(spark, 8) {
    val name = "graft_stream_window_" + math.abs(sfDir.hashCode)
    val stream = spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      // epoch seconds: timestamp dtypes do not compare portably across
      // engines/arrow versions; the oracle casts identically
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** APPEND-mode windowed aggregation with a FILE sink + checkpoint — the
    * 100 TB pattern (complete-mode + memory sink buffers every window on
    * the driver; append emits each finalized window exactly once to
    * files). Deterministic protocol: the real events arrive as batch 1,
    * then a far-future sentinel event as batch 2 advances the watermark
    * past every data window, and Structured Streaming's no-data batch
    * flushes the finalized state to the sink. The sentinel's own window is
    * never finalized, so the emitted set equals the batch aggregation over
    * the real events — the same DuckDB oracle as the complete-mode query. */
  def windowedCountsAppend(spark: SparkSession, sfDir: String): DataFrame =
      withShufflePartitions(spark, 8) {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = spark.conf.getOption("spark.local.dir")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val root = Paths.get(base, "graft-stream-append-" + java.util.UUID.randomUUID())
    val staging = root.resolve("in"); val out = root.resolve("out")
    val ckpt = root.resolve("ckpt")
    Files.createDirectories(staging)

    // batch 1: the real events file
    val src = Paths.get(sfDir, "events.parquet")
    val f1 = staging.resolve("batch1.parquet")
    Files.copy(src, f1, StandardCopyOption.COPY_ATTRIBUTES)
    f1.toFile.setLastModified(1000000L)
    // batch 2: one sentinel event 10 years past the data, in its own file
    // with a strictly later mtime (FileStreamSource orders by mtime)
    val maxSec = spark.read.schema(eventsSchema).parquet(src.toString)
      .agg(max(col("ts")).cast("long")).head().getLong(0)
    val sentinelDir = root.resolve("sentinel")
    spark.sql(
      s"""SELECT CAST(-1 AS BIGINT) AS event_id,
         |       timestamp_seconds(${maxSec + 10L * 365 * 24 * 3600}) AS ts,
         |       CAST(-1 AS BIGINT) AS user_id,
         |       '__sentinel__' AS event_type,
         |       CAST(0.0 AS DOUBLE) AS value, '' AS props""".stripMargin)
      .coalesce(1).write.parquet(sentinelDir.toString)
    val sentinelPart = {
      import scala.jdk.CollectionConverters._
      Files.list(sentinelDir).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
    }
    val f2 = staging.resolve("batch2.parquet")
    Files.move(sentinelPart, f2)
    f2.toFile.setLastModified(2000000L)

    val q = spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staging.toString)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .writeStream
      .format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    // Return the sink read directly and free the scratch root at JVM exit
    // (the Pairs scratch-dir lifecycle): the previous version collect()ed
    // the sink to the driver and rebuilt it as a LocalRelation so the
    // scratch could be deleted eagerly, but that serialized the result
    // through the driver and made every downstream action rescan a
    // driver-local relation — measurable against the bounded
    // one-run-per-session lifecycle of this query, and exactly the shape
    // guide §5 says to avoid. At scale the append sink itself IS the
    // durable output.
    graft.link.Pairs.cleanupOnExit(root.toString)
    spark.read.parquet(out.toString)
  }

  /** Streaming exact dedup with keyed state — the ingestion-path dedup
    * shape at 100 TB (drop re-crawled duplicates of a page/event within a
    * retention window, state evicted by the watermark so it never grows
    * unboundedly). `dropDuplicatesWithinWatermark` keeps per-key state only
    * until the watermark passes the key's event time + delay; here the
    * delay covers the whole corpus span, so the run is deterministic: the
    * real events arrive as micro-batch 1 and a full duplicate copy as
    * micro-batch 2, every duplicate key is still in state, and the emitted
    * set equals the DISTINCT input — the DuckDB oracle is the events table
    * itself. Append mode + file sink + checkpoint (the stream_window_append
    * scale pattern); dedup rows emit in the batch they are first seen, so
    * no watermark-advancing sentinel is needed. */
  def dedupWithinWatermark(spark: SparkSession, sfDir: String): DataFrame =
      withShufflePartitions(spark, 8) {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val base = spark.conf.getOption("spark.local.dir")
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val root = Paths.get(base, "graft-stream-dedup-" + java.util.UUID.randomUUID())
    val staging = root.resolve("in"); val out = root.resolve("out")
    val ckpt = root.resolve("ckpt")
    Files.createDirectories(staging)
    val src = Paths.get(sfDir, "events.parquet")
    // batch 1: the real events; batch 2: a byte-identical duplicate of all
    // of them (FileStreamSource orders by mtime — stageUpdateFile's rule)
    for ((name, seq) <- Seq(("batch1.parquet", 0), ("batch2.parquet", 1))) {
      val f = staging.resolve(name)
      Files.copy(src, f, StandardCopyOption.COPY_ATTRIBUTES)
      f.toFile.setLastModified(1000000L + seq * 60000L)
    }

    val q = spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staging.toString)
      .withWatermark("ts", "87600 hours") // 10 years > corpus span: no eviction
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("ts").cast("long").as("ts_sec"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .writeStream
      .format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    // return the sink read directly; scratch freed at exit (rationale at
    // windowedCountsAppend — the collect()+LocalRelation pin shipped 100k
    // deduped events through the driver twice per downstream action)
    graft.link.Pairs.cleanupOnExit(root.toString)
    spark.read.parquet(out.toString)
  }

  /** Stateless stream upsert into the dictionary table (the reference edit
    * stream): each micro-batch of entity updates is merged into the current
    * snapshot by last-write-wins on revid — expressed with foreachBatch +
    * Snapshots.commit (Iceberg MERGE INTO on a real cluster). */
  def dictUpserts(spark: SparkSession, updates: DataFrame, current: DataFrame): DataFrame = {
    // batch-side merge used by foreachBatch: updates win over current rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("revid").desc)
    current.unionByName(updates)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** delete_excluded semantics (taggerfactory.py:49-95, cli.py:161): a
    * micro-batch of RAW dump items is re-projected through the indexing
    * profile; items that project to a document are upserted, items the
    * profile now filters out are DELETED from the dictionary. */
  def applyDumpUpdates(spark: SparkSession, current: DataFrame,
      rawUpdateLines: org.apache.spark.sql.Dataset[String]): DataFrame = {
    import graft.dict.{DictBuild, DictSpec}
    val all = DictBuild.parseDump(rawUpdateLines)
    // a micro-batch may contain several revisions of one item (the
    // reference fetches the LATEST state per qid): keep max-revid per id so
    // batch granularity cannot change the outcome
    // deterministic tiebreaker on equal lastrevid (two same-revid rows in
    // one micro-batch): order by the serialized item content so row_number
    // cannot pick an arbitrary winner
    val wLatest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("it.id"))
      .orderBy(col("it.lastrevid").desc, to_json(col("it")).desc)
    val items = all.withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1).drop("rn")
    val closures = DictSpec.profile.restrictTypes.map { c =>
      c.qid -> DictSpec.subclassClosure(c.qid.drop(1).toInt)
    }.toMap
    val projected = DictBuild.entityToDocument(items, DictSpec.profile, closures)
    val touched = items.select(col("it.id").as("id")).distinct()
    val deletes = touched.join(projected.select("id"), Seq("id"), "left_anti")
    val kept = current.join(deletes, Seq("id"), "left_anti")
    dictUpserts(spark, projected, kept)
  }

  /** The edit stream as an ACTUAL Structured Streaming query: staged dump
    * files -> readStream.text -> foreachBatch(applyDumpUpdates) -> one
    * committed dictionary snapshot per micro-batch (Snapshots.commit with
    * the batch id in the lineage). The reference's `--after` cursor
    * (streamreader.py:33-34) maps to checkpointLocation: a killed and
    * restarted query resumes after the last committed batch without
    * reprocessing. Call [[latestDict]] for the resulting state. */
  def runDictUpsertStream(spark: SparkSession, updatesDir: String,
      checkpointDir: String, snapshotRoot: String): Unit = {
    import spark.implicits._
    val lines = spark.readStream
      .option("maxFilesPerTrigger", "1") // one staged file per micro-batch
      .text(updatesDir)
    val q = lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark2 = batch.sparkSession
        val current = latestDict(spark2, snapshotRoot)
        val next = applyDumpUpdates(spark2, current,
          batch.select(col("value")).as[String](org.apache.spark.sql.Encoders.STRING))
        val prev = graft.ckpt.Snapshots.latest(spark2, snapshotRoot, "dict_stream")
          .map(s => s"dict_stream:${s._2.snapshotId}").toSeq
        graft.ckpt.Snapshots.commit(next, snapshotRoot, "dict_stream",
          inputs = prev :+ s"batch:$id")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Current dictionary state: the latest committed stream snapshot, or an
    * empty frame with the dictionary schema. */
  def latestDict(spark: SparkSession, snapshotRoot: String): DataFrame =
    graft.ckpt.Snapshots.latest(spark, snapshotRoot, "dict_stream") match {
      case Some((path, _)) => spark.read.parquet(path)
      case None =>
        import spark.implicits._
        val closures = graft.dict.DictSpec.profile.restrictTypes.map { c =>
          c.qid -> graft.dict.DictSpec.subclassClosure(c.qid.drop(1).toInt)
        }.toMap
        graft.dict.DictBuild.entityToDocument(
          graft.dict.DictBuild.parseDump(spark.emptyDataset[String]),
          graft.dict.DictSpec.profile, closures)
    }

  /** Driver-checked scenario: stage the base dump + the revision batch as
    * two files, stream them through [[runDictUpsertStream]] from an empty
    * dictionary, return the final state (oracle: last-write-wins +
    * delete_excluded re-derived in plain Scala / SQL VALUES). */
  /** Stage one update file with an explicit, strictly-increasing mtime:
    * the file stream source orders files by modification time, and files
    * written in the same millisecond would arrive in arbitrary order. */
  def stageUpdateFile(dir: java.nio.file.Path, name: String,
      lines: Seq[String], seq: Int): Unit = {
    val p = dir.resolve(name)
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(1700000000000L + seq * 60000L))
    ()
  }

  def dictUpsertStreamDemo(spark: SparkSession): DataFrame =
      withShufflePartitions(spark, 8) {
    import graft.dict.DictSpec
    val base = java.nio.file.Files.createTempDirectory("graft_stream_upsert")
    val updates = base.resolve("updates"); java.nio.file.Files.createDirectory(updates)
    stageUpdateFile(updates, "000.json", DictSpec.dumpLines, 0)
    stageUpdateFile(updates, "001.json", DictSpec.revisionLines, 1)
    runDictUpsertStream(spark, updates.toString,
      base.resolve("ckpt").toString, base.resolve("snaps").toString)
    latestDict(spark, base.resolve("snaps").toString)
  }
}
