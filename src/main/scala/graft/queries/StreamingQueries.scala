package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch-parity streaming semantics pack (SURVEY.md §2.9): the exact
  * transformations [[graft.streaming.EventsStream]] runs incrementally,
  * executed as batch queries over `events` so the DuckDB oracle can
  * replay them. Window starts are exact integer microsecond arithmetic
  * — engine-independent.
  */
object StreamingQueries {
  private val dec = DecimalType(28, 6)

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // Tumbling 1-hour window aggregate (streaming: groupBy(window(...))
    // with watermark; batch parity: epoch-aligned hour truncation).
    Q(
      "st1_tumbling_window",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
              .as("window_start"),
            col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("value").cast(dec)).cast("double").as("total_value"))
          .orderBy("window_start", "event_type"),
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type""")),

    // ----------------------------------------------------------------
    // Sliding window (1 hour, 30-min slide): every event lands in two
    // windows. Window starts from exact integer µs arithmetic on both
    // engines.
    Q(
      "st2_sliding_window",
      (s, d) => {
        val ev = Tables.events(s, d)
        val slid = ev.select(col("ts"), col("event_type"), col("value"),
            explode(array(lit(0L), lit(1800000000L))).as("off"))
          .withColumn("ws", timestamp_micros(
            expr("((unix_micros(ts) - off) div 3600000000) * 3600000000 + off")))
        slid.groupBy(
            date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("window_start"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("value").cast(dec)).cast("double").as("total_value"))
          .orderBy("window_start")
      },
      Some("""
        SELECT strftime(make_timestamp(
                 ((epoch_us(ts) - off) // 3600000000) * 3600000000 + off),
                 '%Y-%m-%d %H:%M:%S') AS window_start,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events, UNNEST([CAST(0 AS BIGINT), CAST(1800000000 AS BIGINT)]) AS u(off)
        GROUP BY 1
        ORDER BY window_start""")),

    // ----------------------------------------------------------------
    // W5: rows-frame moving average (last 3 events per user). Frame
    // sums go through exact decimal so segment-tree vs sequential
    // window evaluation cannot diverge.
    Q(
      "w5_moving_avg",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(-2, Window.currentRow)
        Tables.events(s, d)
          .withColumn("mov_sum",
            sum(col("value").cast(dec)).over(w).cast("double"))
          .withColumn("mov_n", count(lit(1)).over(w))
          .withColumn("mov_avg", col("mov_sum") / col("mov_n"))
          .select("event_id", "user_id", "mov_sum", "mov_n", "mov_avg")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS mov_sum,
               COUNT(*) OVER w AS mov_n,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
                 / COUNT(*) OVER w AS mov_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // W6: running total per user (cumulative frame) — the incremental
    // counter a dashboard keeps, as a batch window.
    Q(
      "w6_running_total",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("running_value",
            sum(col("value").cast(dec)).over(w).cast("double"))
          .withColumn("running_n", count(lit(1)).over(w))
          .select("event_id", "user_id", "running_value", "running_n")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
                 AS running_value,
               COUNT(*) OVER w AS running_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // Sessionization as gaps-and-islands (batch parity of
    // flatMapGroupsWithState): 30-min inactivity gap, exact µs duration.
    Q(
      "st3_sessionize",
      (s, d) => {
        val ev = Tables.events(s, d)
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val flagged = ev
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull.or(
              expr("unix_micros(ts) - unix_micros(prev_ts)") > 1800000000L), 1)
              .otherwise(0))
          .withColumn("session_idx",
            sum(col("new_session")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        flagged.groupBy("user_id", "session_idx")
          .agg(
            count(lit(1)).as("n_events"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
            (max(expr("unix_micros(ts)")) - min(expr("unix_micros(ts)")))
              .as("duration_us"),
            sum(col("value").cast(dec)).cast("double").as("total_value"))
          .orderBy("user_id", "session_idx")
      },
      Some("""
        WITH flagged AS (
          SELECT user_id, ts, value, event_id,
                 CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                      THEN 1 ELSE 0 END AS new_session
          FROM (
            SELECT user_id, ts, value, event_id,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS prev_ts
            FROM events)),
        sessions AS (
          SELECT user_id, ts, value,
                 CAST(SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
          FROM flagged)
        SELECT user_id, session_idx,
               COUNT(*) AS n_events,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM sessions
        GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx""")),

    // ----------------------------------------------------------------
    // Stream-static enrichment (batch parity of
    // [[graft.streaming.EventsStream.enrichedCounts]]): events
    // broadcast-left-join the customer dimension on user_id, then the
    // tumbling-hour aggregate per market segment. In streaming form the
    // dimension is re-resolved per micro-batch; the batch form is the
    // identical plan minus the watermark.
    Q(
      "st4_stream_enrich",
      (s, d) => {
        val dim = Tables.customer(s, d)
          .select(col("c_custkey").as("user_id"),
            col("c_mktsegment").as("seg"))
        Tables.events(s, d)
          .join(broadcast(dim), Seq("user_id"), "left")
          .withColumn("segment", coalesce(col("seg"), lit("unknown")))
          .groupBy(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
              .as("window_start"),
            col("segment"))
          .agg(
            count(lit(1)).as("cnt"),
            sum(col("value").cast(dec)).cast("double").as("total_value"))
          .orderBy("window_start", "segment")
      },
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
               COALESCE(c_mktsegment, 'unknown') AS segment,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events LEFT JOIN customer ON user_id = c_custkey
        GROUP BY 1, 2
        ORDER BY window_start, segment""")),

    // ----------------------------------------------------------------
    // Stream-stream interval join (batch parity of
    // [[graft.streaming.EventsStream.clickAttribution]]): purchases
    // attributed to same-user clicks within the preceding 30 minutes —
    // an equi-join on user_id with a two-sided event-time bound (the
    // condition that lets streaming evict join state).
    Q(
      "st5_click_attrib",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.streaming.EventsStream.clickAttribution(ev)
          .orderBy("click_id", "purchase_id")
      },
      Some("""
        SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
               p.value,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts
         AND p.ts < c.ts + INTERVAL 30 MINUTE
        ORDER BY click_id, purchase_id""")),

    // ----------------------------------------------------------------
    // Watermark-lateness audit: how much data WOULD a 2-hour watermark
    // drop, and how late does the stream really run? An event is late
    // when its event time sits >2 h behind the max event time of
    // everything that arrived STRICTLY before it (arrival order =
    // event_id). The running max uses the same two-pass bucketed
    // prefix-scan as ts5 (max is associative: per-bucket maxes → prefix
    // carry over the bucket-count-sized frame → within-bucket exclusive
    // running max) — no single-partition total order over the stream.
    // The oracle runs the naive one-window form; results must match
    // exactly.
    Q(
      "st6_lateness_audit",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("t"))
          .withColumn("bucket", expr("event_id div 1024"))
        val wCarry = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)
        val carries = ev.groupBy("bucket").agg(max("t").as("bmax"))
          .withColumn("carry", max("bmax").over(wCarry))
          .select("bucket", "carry")
        val wLocal = Window.partitionBy("bucket").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val late = ev.join(broadcast(carries), "bucket")
          .withColumn("seen_max",
            greatest(coalesce(max("t").over(wLocal), lit(Long.MinValue)),
              coalesce(col("carry"), lit(Long.MinValue))))
          .withColumn("lateness_us",
            when(col("seen_max") === Long.MinValue, 0L)
              .otherwise(greatest(col("seen_max") - col("t"), lit(0L))))
        late.groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            count(when(col("lateness_us") > 7200000000L, 1)).as("n_late"),
            max("lateness_us").as("max_lateness_us"))
          .orderBy("event_type")
      },
      Some("""
        WITH ev AS (
          SELECT event_id, event_type, epoch_us(ts) AS t FROM events),
        run AS (
          SELECT event_id, event_type, t,
                 MAX(t) OVER (ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen_max
          FROM ev),
        late AS (
          SELECT event_type,
                 CASE WHEN seen_max IS NULL THEN 0
                      ELSE GREATEST(seen_max - t, 0) END AS lateness_us
          FROM run)
        SELECT event_type, COUNT(*) AS n_events,
               COUNT(CASE WHEN lateness_us > 7200000000 THEN 1 END) AS n_late,
               MAX(lateness_us) AS max_lateness_us
        FROM late GROUP BY 1 ORDER BY event_type"""))
  )
}
