package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** §2.G — batch twins of the streaming pipelines.
  *
  * The genuine `readStream`/`writeStream` pipelines live in
  * [[graft.streaming.EventStreams]]; these operators run the same
  * event-time semantics (tumbling windows, gap sessionization,
  * key dedup) in batch so the DuckDB oracle can check them. The
  * streaming surface is the incremental version of the reference's
  * daily dated-folder scan (main - 基金单提取程序.py walks
  * `\\...\估值材料（备查）/<year>/<yyyymmdd>/`;
  * purchase_confirm_extractor.py:1432 os.walk) — statements drop in,
  * the pipeline picks them up.
  */
object StreamingTwins {
  private type Q = (SparkSession, String) => DataFrame

  /** Event-time tumbling window aggregate — batch twin of the
    * watermarked streaming agg (same `window()` operator Structured
    * Streaming uses; keyed by (window, type), the natural shuffle key).
    */
  val stTumblingAgg: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy(col("window_start"), col("event_type"))

  /** Gap-based sessionization (30-min inactivity) via gaps-and-islands:
    * lag → new-session flag → running sum → per-session aggregate.
    * Batch twin of flatMapGroupsWithState sessionization.
    */
  val stSessionize: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(unix_micros(min(col("ts"))).as("start_us"),
        unix_micros(max(col("ts"))).as("end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Key dedup keep-first within a minute bucket — batch twin of
    * streaming dropDuplicates under a watermark.
    */
  val stDedupEvents: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("minute_b"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("minute_b", date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("minute_b"))
      .orderBy(col("event_id"))
  }

  /** Stream-stream interval join twin: click→purchase attribution —
    * each purchase matches the same user's clicks in the preceding 30
    * minutes. In streaming this is the watermarked interval join
    * (EventStreams.attributeJoin); in batch, an equi-join on user_id
    * with the time-range predicate. The equi key carries the shuffle;
    * the range condition prunes post-join — the same plan a 100 TB
    * attribution pipeline runs.
    */
  val stStreamJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("purchase_us"), col("value"))
    clicks.join(purchases, Seq("user_id"))
      .filter(col("purchase_us") >= col("click_us") &&
        col("purchase_us") - col("click_us") <= 1800L * 1000000L)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("purchase_us") - col("click_us")).as("lag_us"),
        round(col("value"), 2).as("value"))
      .orderBy(col("click_id"), col("purchase_id"))
  }

  /** Native session_window() sessionization — Spark's built-in session
    * operator (works identically in batch and Structured Streaming
    * with a watermark). Differs from the gaps-and-islands twin in the
    * emitted bounds: window.end = last event + gap, and an event
    * exactly gap after the previous one starts a NEW session (windows
    * are half-open [ts, ts+gap)); the oracle mirrors both.
    */
  val stSessionWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"), col("total_value"))
      .orderBy(col("user_id"), col("start_us"))

  /** Watermark lateness audit with faithful micro-batch semantics —
    * which events WOULD be dropped by `withWatermark("ts", "10
    * minutes")` when the source's partitions replay at different
    * speeds (the Kafka-partition-lag scenario watermark delay exists
    * for; this corpus is perfectly ordered, so lateness must come
    * from the arrival model, not the data). Deterministic replay: 8
    * source partitions keyed user_id%8, partition p drains at rate
    * 64/(64+p); arrival ticks of 500 events form micro-batches; the
    * watermark for a batch is the max event time of all PRIOR batches
    * minus G — exactly how Structured Streaming advances watermarks.
    *
    * Scale shape: per-partition row_number (partitioned window), one
    * groupBy to tick-level maxima, a running max over the TINY tick
    * table (rows = corpus/500 — the only global window, bounded), and
    * a broadcast join back. No global per-event window.
    */
  val stLatenessAudit: Q = (s, d) => {
    val wPart = Window.partitionBy(col("src_part")).orderBy(col("event_id"))
    val arr = Tables.events(s, d)
      .withColumn("src_part", col("user_id") % 8)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("arrival_rank",
        expr("(row_number() OVER (PARTITION BY src_part ORDER BY event_id) " +
          "* (64 + src_part)) div 64"))
      .withColumn("tick", expr("arrival_rank div 500"))
    val wTick = Window.orderBy(col("tick"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val watermarks = arr.groupBy(col("tick"))
      .agg(max(col("ts_us")).as("tick_max"))
      .withColumn("watermark", max(col("tick_max")).over(wTick) - 600000000L)
      .select(col("tick"), col("watermark"))
    arr.join(broadcast(watermarks), "tick")
      .filter(col("ts_us") < col("watermark"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        (col("watermark") - col("ts_us")).as("late_by_us"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, Q] = Map(
    "st_tumbling_agg" -> stTumblingAgg,
    "st_sessionize" -> stSessionize,
    "st_dedup_events" -> stDedupEvents,
    "st_stream_join" -> stStreamJoin,
    "st_session_window" -> stSessionWindow,
    "st_lateness_audit" -> stLatenessAudit)

  val oracles: Map[String, String] = Map(
    "st_lateness_audit" ->
      """WITH arr AS (
        | SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  (row_number() OVER (PARTITION BY user_id % 8 ORDER BY event_id)
        |    * (64 + user_id % 8)) // 64 AS arrival_rank
        | FROM events),
        |t AS (SELECT event_id, user_id, ts_us, arrival_rank // 500 AS tick FROM arr),
        |wm AS (
        | SELECT tick,
        |  max(tick_max) OVER (ORDER BY tick
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 600000000 AS watermark
        | FROM (SELECT tick, max(ts_us) AS tick_max FROM t GROUP BY tick) x)
        |SELECT t.event_id, t.user_id, t.ts_us,
        | wm.watermark - t.ts_us AS late_by_us
        |FROM t JOIN wm USING (tick)
        |WHERE t.ts_us < wm.watermark ORDER BY t.event_id""".stripMargin,
    "st_tumbling_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "st_sessionize" ->
      """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        | min(ts_us) AS start_us, max(ts_us) AS end_us,
        | count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM (
        | SELECT user_id, value, ts_us,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
        |   CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
        |          OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |             > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events) flagged) sessions
        |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
    "st_dedup_events" ->
      """SELECT event_id, user_id, event_type, minute_b FROM (
        | SELECT event_id, user_id, event_type,
        |  strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute_b,
        |  row_number() OVER (PARTITION BY user_id, event_type, date_trunc('minute', ts)
        |                     ORDER BY ts, event_id) AS rn
        | FROM events) t
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,
    "st_stream_join" ->
      """SELECT c.user_id, c.click_id, p.purchase_id,
        | p.purchase_us - c.click_us AS lag_us, round(p.value, 2) AS value
        |FROM (SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
        |      FROM events WHERE event_type = 'click') c
        |JOIN (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us, value
        |      FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        |WHERE p.purchase_us >= c.click_us
        |  AND p.purchase_us - c.click_us <= 1800 * 1000000
        |ORDER BY click_id, purchase_id""".stripMargin,
    "st_session_window" ->
      """SELECT user_id, min(ts_us) AS start_us,
        | max(ts_us) + 1800 * 1000000 AS end_us,
        | count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM (
        | SELECT user_id, value, ts_us,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        | FROM (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
        |   CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
        |          OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |             >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events) flagged) sessions
        |GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin)
}
