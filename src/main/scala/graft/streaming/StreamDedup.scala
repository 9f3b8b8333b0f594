package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental counterpart of the
  * batch hash-dedup ([[graft.operators.Dedup.qDedupExact]]): keep the
  * first occurrence of each content key, dropping repeats that arrive
  * later in the stream.
  *
  * `dropDuplicatesWithinWatermark` keeps per-key state ONLY until the
  * watermark passes the key's event time: on an unbounded 100 TB/day
  * ingest the state store holds one row per distinct key per watermark
  * horizon, not per history — duplicates separated by more than the
  * horizon are admitted again (the deliberate trade every streaming
  * dedup makes; the batch pipeline catches the stragglers).
  */
object StreamDedup {

  /** First occurrence per content key within the watermark horizon.
    * `keyCols` are hashed into one 16-byte dedup key so state rows stay
    * fixed-width regardless of how wide the key tuple is. */
  def dedupe(events: DataFrame, keyCols: Seq[String], eventTime: String,
      delay: String): DataFrame =
    events
      .withColumn("dedup_key", md5(concat_ws("", keyCols.map(col): _*)))
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark("dedup_key")

  /** The corpus-curation funnel as a stream: quality gate and
    * deterministic hash sample are stateless row filters (they run
    * unchanged on a stream — same codegen stage as the source), and the
    * dedup stage is the watermark-bounded first-occurrence keep. A
    * 100 TB/day ingest curates incrementally with per-key state only
    * inside the watermark horizon; the batch funnel (q_corpus_curate)
    * remains the periodic full-history pass that catches
    * cross-horizon duplicates. StreamDedupSpec asserts the streamed
    * survivor set equals the batch replay of the same gates. */
  def curateStream(docs: DataFrame, eventTime: String, delay: String): DataFrame =
    dedupe(
      docs
        .filter(graft.functions.TextAnalysis.qualityScore(col("text")) >= 0.6)
        .filter(md5(concat(lit("cur"), col("doc_id").cast("string"))) < "8"),
      keyCols = Seq("text"), eventTime = eventTime, delay = delay)

  /** Batch replay of the streaming dedup (what an in-order stream
    * converges to): per content key, the earliest (ts, event_id) row
    * wins. One shuffle on the dedup key; StreamDedupSpec asserts the
    * streaming run over file micro-batches returns exactly this. */
  def qStreamDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("dedup_key"))
      .orderBy(col("ts"), col("event_id"))
    graft.Tables.events(s, dir)
      .withColumn("dedup_key", md5(col("props")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("ts"), col("dedup_key"))
      .orderBy("dedup_key")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_dedup" -> qStreamDedup,
  )

  val oracles: Map[String, String] = Map(
    "q_stream_dedup" ->
      """SELECT event_id, ts, dedup_key FROM (
        |  SELECT event_id, ts, md5(props) AS dedup_key,
        |    row_number() OVER (PARTITION BY md5(props) ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY dedup_key""".stripMargin,
  )
}
