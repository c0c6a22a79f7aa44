package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time streaming operators the reference lacks entirely (its
  * `datetime` is carried as payload, never compared — SURVEY.md §2) but a
  * complete stream engine needs: watermarked tumbling/sliding aggregation,
  * session windows, and cross-batch streaming dedup.
  *
  * All operate on any DataFrame (streaming or batch) with an event-time
  * column; in streaming mode the watermark bounds state and drops late
  * data, which is the only way these stay O(live-windows) at 100 TB/day.
  */
object WindowedStreams {

  /** Tumbling event-time counts/sums with a watermark. Append-mode
    * emission: a window finalizes once the watermark passes its end. */
  def tumbling(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol)) * 100, 0).cast("long").as("sum_value_c"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value_c"))

  /** Sliding windows (overlapping assignment — one input row feeds
    * len/slide windows). */
  def sliding(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /** Session windows: gap-merged activity periods per key. */
  def sessions(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n"))

  /** Streaming exact dedup on a key set: state bounded by the watermark
    * (duplicates arriving later than the watermark are not suppressed —
    * the documented at-least-once residue). */
  def dedup(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)
}
