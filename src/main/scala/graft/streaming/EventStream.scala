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

  /** Tumbling 1-hour windowed counts/sums per event type with a 1-hour
    * watermark, executed as a streaming query into a memory sink and
    * returned as a batch DataFrame (complete mode => equals the batch
    * aggregation over the same files, which is the DuckDB oracle). */
  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
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
    val items = DictBuild.parseDump(rawUpdateLines)
    val closures = DictSpec.profile.restrictTypes.map { c =>
      c.qid -> DictSpec.subclassClosure(c.qid.drop(1).toInt)
    }.toMap
    val projected = DictBuild.entityToDocument(items, DictSpec.profile, closures)
    val touched = items.select(col("it.id").as("id")).distinct()
    val deletes = touched.join(projected.select("id"), Seq("id"), "left_anti")
    val kept = current.join(deletes, Seq("id"), "left_anti")
    dictUpserts(spark, projected, kept)
  }
}
