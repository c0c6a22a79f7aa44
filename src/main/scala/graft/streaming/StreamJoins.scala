package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream joins with watermark-bounded state — the remaining
  * streaming-join category a complete engine needs (the reference only
  * ever joins a stream against a static catalog).
  *
  * State on both sides is bounded by the watermark plus the join's time
  * range condition; without the range bound the state would grow without
  * limit at 100 TB/day.
  */
object StreamJoins {

  /** Conversion join: for each left event, right events of the same key
    * within (0, windowSeconds] AFTER it — e.g. purchases following clicks.
    * Both inputs may be streaming; requires watermarks on both. */
  def followedBy(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, watermark: String,
      windowSeconds: Int): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") > col(s"l.$leftTs") &&
        col(s"r.$rightTs") <=
          col(s"l.$leftTs") + expr(s"INTERVAL $windowSeconds SECONDS"))
  }
}
