package graft.queries

import graft.Tables
import graft.functions.Deterministic._
import graft.functions.Scores
import graft.pipeline.Quality
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-round coverage pack: the SURVEY §2 rows not yet exercised by a
  * named gate query (A4 language stats, reference-exact score suite,
  * drift detector) plus the relational shapes a training-data pipeline
  * leans on at scale that the reference never needed — ROLLUP grouping
  * sets, range joins, pivot, lead/lag/ntile.
  *
  * Determinism: double sums via exact DECIMAL accumulation, every
  * ranking totally ordered, timestamps emitted as strings (see
  * [[Relational]]'s header).
  */
object ExtendedOps {

  private def dsumSql(x: String) =
    s"CAST(SUM(CAST($x AS DECIMAL(28,6))) AS DOUBLE)"
  private def davgSql(x: String) = s"${dsumSql(x)} / COUNT($x)"

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // A4 (language stats, silver_to_gold_analytics.py:513-524): count /
    // sum / avg / conditional-sum by language, plus exact countDistinct
    // of sources — one hash-agg pass.
    Q(
      "a4_language_stats",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            davg(col("n_chars").cast("double")).as("avg_chars"),
            sum(when(col("n_chars") >= 500, 1).otherwise(0)).as("n_long"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy("lang"),
      Some(s"""
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               ${davgSql("CAST(n_chars AS DOUBLE)")} AS avg_chars,
               CAST(SUM(CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_long,
               COUNT(DISTINCT source) AS n_sources
        FROM documents
        GROUP BY lang
        ORDER BY lang""")),

    // ----------------------------------------------------------------
    // Grouping sets: ROLLUP over the A1 keys — subtotal and grand-total
    // rows in the same single-pass aggregate (Spark expands rollup into
    // one Expand + hash-agg; no per-level rescan). The reference has no
    // grouping sets; a 100 TB dashboard pipeline computes per-category,
    // per-status and global tiles in one shuffle this way.
    Q(
      "a11_rollup_sets",
      (s, d) =>
        Tables.lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            dsum(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("n_rows"), col("sum_qty"))
          .orderBy("flag", "status"),
      Some(s"""
        SELECT COALESCE(l_returnflag, 'ALL') AS flag,
               COALESCE(l_linestatus, 'ALL') AS status,
               COUNT(*) AS n_rows,
               ${dsumSql("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY flag, status""")),

    // ----------------------------------------------------------------
    // Semi-structured extraction: events carry a JSON `props` payload
    // (the telemetry-envelope shape — §2's S4 JSON parse applied to a
    // COLUMN instead of a file). get_json_object evaluates inside
    // whole-stage codegen, the extracted value feeds a plain hash-agg,
    // and the path never leaves the scan stage — at 100 TB this is the
    // "parse on read" plan, no staging table. Integer sums cast to
    // BIGINT on both engines (DuckDB SUM yields HUGEINT).
    Q(
      "e1_json_extract",
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"),
            count(when(col("k") >= 50, 1)).as("n_hi"))
          .orderBy("event_type"),
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
               COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                     THEN 1 END) AS n_hi
        FROM events
        GROUP BY event_type
        ORDER BY event_type""")),

    // ----------------------------------------------------------------
    // Range join: month-start snapshots against the 30-day validity
    // interval [l_shipdate, l_shipdate + 30d) — the "active records as
    // of T" shape behind every lookback window (§2.9c). A naive
    // broadcast-nested-loop evaluates the range predicate |lineitem| ×
    // |snaps| times (13.5 s at sf0.1, non-starter at 100×). Instead:
    // a 30-day interval can overlap only month-starts in
    // {trunc(l_shipdate), +1 month, +2 months} (the +2 case: Jan 31's
    // window [Jan 31, Mar 2) skips Feb's trunc but reaches Mar 1), so
    // explode each row into those ≤3 candidate keys, broadcast-hash
    // equi-join on the key, and apply the exact range predicate after.
    // O(3·|lineitem|) probes, a plain hash join that scales out.
    Q(
      "j7_range_join",
      (s, d) => {
        val snaps = Tables.orders(s, d)
          .select(date_trunc("month", col("o_orderdate")).as("snap"))
          .distinct()
        val m0 = date_trunc("month", col("l_shipdate"))
        val li = Tables.lineitem(s, d)
          .withColumn("snap", explode(array(
            m0, m0 + expr("INTERVAL 1 MONTH"), m0 + expr("INTERVAL 2 MONTH"))))
        li.join(broadcast(snaps), "snap")
          .filter(col("l_shipdate") <= col("snap") &&
            col("snap") < col("l_shipdate") + expr("INTERVAL 30 DAYS"))
          .groupBy(date_format(col("snap"), "yyyy-MM-dd").as("snap_day"))
          .agg(count(lit(1)).as("n_open"),
            dsum(col("l_quantity")).as("open_qty"))
          .orderBy("snap_day")
      },
      Some(s"""
        WITH snaps AS (
          SELECT DISTINCT date_trunc('month', o_orderdate) AS snap FROM orders)
        SELECT strftime(snap, '%Y-%m-%d') AS snap_day,
               COUNT(*) AS n_open,
               ${dsumSql("l_quantity")} AS open_qty
        FROM lineitem JOIN snaps
          ON l_shipdate <= snap AND snap < l_shipdate + INTERVAL 30 DAY
        GROUP BY snap
        ORDER BY snap_day""")),

    // ----------------------------------------------------------------
    // §2.11 drift detector (llm_classifier.py:365-418): two
    // deterministic classification snapshots derived from `part`
    // (disjoint membership → added/removed; a rule shift → reclassified),
    // full-outer joined and rolled up by transition.
    Q(
      "dr1_class_drift",
      (s, d) => {
        val p = Tables.part(s, d)
        val prev = p.filter(col("p_partkey") % 11 =!= 0)
          .select(col("p_partkey").as("repository_id"),
            concat(lit("cat"), (col("p_partkey") % 5).cast("string"))
              .as("technology_category"))
        val cur = p.filter(col("p_partkey") % 13 =!= 0)
          .select(col("p_partkey").as("repository_id"),
            when(col("p_partkey") % 7 === 0, lit("cat9"))
              .otherwise(concat(lit("cat"), (col("p_partkey") % 5).cast("string")))
              .as("technology_category"))
        Quality.classificationDrift(prev, cur)
          .orderBy("status", "prev_category", "cur_category")
      },
      Some("""
        WITH prev AS (
          SELECT p_partkey AS id, 'cat' || CAST(p_partkey % 5 AS VARCHAR) AS pc
          FROM part WHERE p_partkey % 11 != 0),
        cur AS (
          SELECT p_partkey AS id,
                 CASE WHEN p_partkey % 7 = 0 THEN 'cat9'
                      ELSE 'cat' || CAST(p_partkey % 5 AS VARCHAR) END AS cc
          FROM part WHERE p_partkey % 13 != 0),
        j AS (
          SELECT pc AS prev_category, cc AS cur_category,
                 CASE WHEN pc IS NULL THEN 'added'
                      WHEN cc IS NULL THEN 'removed'
                      WHEN pc != cc THEN 'reclassified'
                      ELSE 'stable' END AS status
          FROM prev FULL OUTER JOIN cur USING (id))
        SELECT prev_category, cur_category, status, COUNT(*) AS n_repos
        FROM j
        GROUP BY prev_category, cur_category, status
        ORDER BY status, prev_category, cur_category""")),

    // ----------------------------------------------------------------
    // §2.11 per-repo drift records (llm_classifier.py:372-418): the
    // reviewer-facing surface — old/new classification triples with
    // confidence drop, requires_review, and the reference's exact
    // severity ladder — over two deterministic snapshots derived from
    // `part` whose confidences sweep the full [0,1] range so every
    // severity branch fires.
    Q(
      "dr2_drift_records",
      (s, d) => {
        val p = Tables.part(s, d)
        val k = col("p_partkey")
        val prev = p.filter(k % 11 =!= 0).select(
          k.as("repository_id"),
          concat(lit("cat"), (k % 5).cast("string")).as("technology_category"),
          concat(lit("sub"), (k % 3).cast("string")).as("technology_subcategory"),
          ((k % 101).cast("double") / 100.0).as("classification_confidence"))
        val cur = p.filter(k % 13 =!= 0).select(
          k.as("repository_id"),
          when(k % 7 === 0, lit("cat9"))
            .otherwise(concat(lit("cat"), (k % 5).cast("string")))
            .as("technology_category"),
          concat(lit("sub"), ((k + 1) % 3).cast("string"))
            .as("technology_subcategory"),
          (((k * 7) % 101).cast("double") / 100.0)
            .as("classification_confidence"))
        Quality.driftRecords(prev, cur).orderBy("repository_id")
      },
      Some("""
        WITH prev AS (
          SELECT p_partkey AS repository_id,
                 'cat' || CAST(p_partkey % 5 AS VARCHAR) AS old_category,
                 'sub' || CAST(p_partkey % 3 AS VARCHAR) AS old_subcategory,
                 CAST(p_partkey % 101 AS DOUBLE) / 100.0 AS old_confidence
          FROM part WHERE p_partkey % 11 != 0),
        cur AS (
          SELECT p_partkey AS repository_id,
                 CASE WHEN p_partkey % 7 = 0 THEN 'cat9'
                      ELSE 'cat' || CAST(p_partkey % 5 AS VARCHAR) END AS new_category,
                 'sub' || CAST((p_partkey + 1) % 3 AS VARCHAR) AS new_subcategory,
                 CAST((p_partkey * 7) % 101 AS DOUBLE) / 100.0 AS new_confidence
          FROM part WHERE p_partkey % 13 != 0)
        SELECT repository_id, old_category, old_subcategory, old_confidence,
               new_category, new_subcategory, new_confidence,
               old_confidence - new_confidence AS confidence_change,
               (old_confidence - new_confidence) > 0.3 AS requires_review,
               CASE WHEN old_confidence - new_confidence > 0.5 THEN 'high'
                    WHEN old_confidence - new_confidence > 0.3 THEN 'medium'
                    WHEN old_confidence > 0.9 AND new_confidence < 0.7 THEN 'medium'
                    ELSE 'low' END AS drift_severity
        FROM prev JOIN cur USING (repository_id)
        WHERE old_category != new_category
        ORDER BY repository_id""")),

    // ----------------------------------------------------------------
    // h4: approx_top_k (Spark 4's frequency-sketch top-k aggregate) in
    // the sketch-tier verdict discipline (a14/t14/h1): the sketch AND
    // the exact ranking computed in one query, compared as a bounded
    // verdict the oracle predicts exactly. Item CHOICE among tied
    // boundary counts is sketch-internal, so the verdict checks
    // count-level properties (estimates exact for reported items;
    // every reported count ≥ the true 5th-highest), never the tied
    // item identities. At 100 TB the sketch is one map-side-merging
    // pass; the exact ranking it replaces is a full shuffle.
    Q(
      "h4_approx_topk",
      (s, d) => {
        val ev = Tables.events(s, d)
        val approx = ev.select(expr("inline(approx_top_k(user_id, 5))"))
        val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
        val kth = exact.select(col("n"))
          .orderBy(col("n").desc).limit(5)
          .agg(min("n").as("kth_n"))
        approx.join(exact, col("item") === col("user_id"), "left")
          .crossJoin(broadcast(kth))
          .agg(
            count(lit(1)).as("n_reported"),
            count(when(col("count") === col("n"), 1)).as("n_est_exact"),
            min(when(col("count") >= col("kth_n"), 1).otherwise(0))
              .as("covers_topk"))
      },
      Some("""
        WITH exact AS (
          SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
        kth AS (
          SELECT MIN(n) AS kth_n FROM (
            SELECT n FROM exact ORDER BY n DESC LIMIT 5))
        SELECT CAST(5 AS BIGINT) AS n_reported,
               CAST(5 AS BIGINT) AS n_est_exact,
               1 AS covers_topk"""))
      ,

    // ----------------------------------------------------------------
    // h5: MERGEABLE distinct-count sketches (Datasketches HLL) — the
    // incremental-maintenance pattern a14's scalar approx_count_distinct
    // can't do: per-day sketches built once (at 100 TB: persisted with
    // each partition write), then ANY cross-day distinct question is a
    // sketch union — no rescan of history. Verdict: the unioned
    // estimate within 5% of the exact cross-day distinct, and per-day
    // estimates within 5% of per-day exacts — an all-ones frame the
    // oracle predicts.
    Q(
      "h5_hll_union",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(date_trunc("day", col("ts")).cast("date").as("day"), col("user_id"))
        val daily = ev.groupBy("day")
          .agg(expr("hll_sketch_agg(user_id)").as("sk"),
            countDistinct("user_id").as("exact_day"))
          .withColumn("day_ok",
            (abs(expr("hll_sketch_estimate(sk)") - col("exact_day"))
              <= col("exact_day") * 0.05).cast("int"))
        val total = ev.agg(countDistinct("user_id").as("exact_total"))
        daily.agg(
            expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_total"),
            min("day_ok").as("all_days_ok"),
            count(lit(1)).as("n_days"))
          .crossJoin(broadcast(total))
          .select(
            col("n_days"),
            col("all_days_ok"),
            (abs(col("est_total") - col("exact_total"))
              <= col("exact_total") * 0.05).cast("int").as("union_ok"))
      },
      Some("""
        SELECT CAST(COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS BIGINT)
                 AS n_days,
               1 AS all_days_ok,
               1 AS union_ok
        FROM events""")),

    // ----------------------------------------------------------------
    // h6: MERGEABLE quantile sketches (Datasketches KLL) — h5's
    // companion for percentiles: per-day sketches of the value
    // distribution, merged per event type across days, quantiles read
    // from the merged sketch. Verdict discipline: the sketch's exact
    // retained-count must equal the true count, and the TRUE rank of
    // the sketch's p50 answer must sit within ±6% of 0.5 (KLL default-k
    // normalized rank error is ~1.65% at 99% confidence — the bound is
    // generous, the oracle predicts all-ones).
    Q(
      "h6_kll_union",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"),
            date_trunc("day", col("ts")).cast("date").as("day"), col("value"))
        val daily = ev.groupBy("event_type", "day")
          .agg(expr("kll_sketch_agg_double(value)").as("sk"))
        val merged = daily.groupBy("event_type")
          .agg(expr("kll_merge_agg_double(sk)").as("sk"))
          .select(col("event_type"),
            expr("kll_sketch_get_quantile_double(sk, 0.5)").as("est50"),
            expr("kll_sketch_get_n_double(sk)").as("n_sketch"))
        ev.join(broadcast(merged), "event_type")
          .groupBy("event_type", "n_sketch")
          .agg(count(lit(1)).as("n_rows"),
            count(when(col("value") <= col("est50"), 1)).as("n_le"))
          .select(
            col("event_type"), col("n_rows"),
            (col("n_sketch") === col("n_rows")).cast("int").as("n_match"),
            (col("n_le").cast("double") / col("n_rows")).between(0.44, 0.56)
              .cast("int").as("rank_ok"))
          .orderBy("event_type")
      },
      Some("""
        SELECT event_type, COUNT(*) AS n_rows, 1 AS n_match, 1 AS rank_ok
        FROM events GROUP BY 1 ORDER BY event_type""")),

    // ----------------------------------------------------------------
    // dr3: chi-square drift statistic per category — the STATISTICAL
    // complement to dr1's row-level diff: expected counts scale the old
    // distribution to the new total, and each category's (O−E)²/E
    // contribution flags where the shift concentrates. Per-category
    // contributions are emitted (not a single summed scalar: a 5-term
    // double sum would be partition-order-dependent, the rows are not);
    // every float expression is fixed-shape, identical on both engines.
    Q(
      "dr3_chi2_drift",
      (s, d) => {
        val p = Tables.part(s, d)
        val k = col("p_partkey")
        val old = p.filter(k % 11 =!= 0)
          .groupBy(concat(lit("cat"), (k % 5).cast("string")).as("category"))
          .agg(count(lit(1)).as("n_old"))
        val neu = p.filter(k % 13 =!= 0)
          .groupBy(when(k % 7 === 0, concat(lit("cat"), ((k % 5 + 1) % 5).cast("string")))
            .otherwise(concat(lit("cat"), (k % 5).cast("string"))).as("category"))
          .agg(count(lit(1)).as("n_new"))
        val joined = old.join(neu, "category")
        val tot = joined.agg(sum("n_old").as("tot_old"), sum("n_new").as("tot_new"))
        val e = col("n_old").cast("double") * col("tot_new") / col("tot_old")
        joined.crossJoin(broadcast(tot))
          .withColumn("expected", e)
          .withColumn("chi2_contrib",
            (col("n_new") - col("expected")) * (col("n_new") - col("expected"))
              / col("expected"))
          .withColumn("drifted", col("chi2_contrib") > 3.841) // χ²₁ at α=0.05
          .select("category", "n_old", "n_new", "expected", "chi2_contrib", "drifted")
          .orderBy("category")
      },
      Some("""
        WITH old AS (
          SELECT 'cat' || CAST(p_partkey % 5 AS VARCHAR) AS category,
                 COUNT(*) AS n_old
          FROM part WHERE p_partkey % 11 <> 0 GROUP BY 1),
        neu AS (
          SELECT CASE WHEN p_partkey % 7 = 0
                   THEN 'cat' || CAST((p_partkey % 5 + 1) % 5 AS VARCHAR)
                   ELSE 'cat' || CAST(p_partkey % 5 AS VARCHAR) END AS category,
                 COUNT(*) AS n_new
          FROM part WHERE p_partkey % 13 <> 0 GROUP BY 1),
        j AS (SELECT * FROM old JOIN neu USING (category)),
        t AS (SELECT SUM(n_old) AS tot_old, SUM(n_new) AS tot_new FROM j)
        SELECT category, n_old, n_new,
               CAST(n_old AS DOUBLE) * tot_new / tot_old AS expected,
               (n_new - CAST(n_old AS DOUBLE) * tot_new / tot_old)
                 * (n_new - CAST(n_old AS DOUBLE) * tot_new / tot_old)
                 / (CAST(n_old AS DOUBLE) * tot_new / tot_old) AS chi2_contrib,
               (n_new - CAST(n_old AS DOUBLE) * tot_new / tot_old)
                 * (n_new - CAST(n_old AS DOUBLE) * tot_new / tot_old)
                 / (CAST(n_old AS DOUBLE) * tot_new / tot_old) > 3.841 AS drifted
        FROM j, t
        ORDER BY category""")),

    // ----------------------------------------------------------------
    // Lead/lag/ntile per user: inter-event gaps in exact microseconds
    // plus a per-user quartile — the navigation-function family the
    // reference never uses but sessionization/funnel work needs.
    Q(
      "w7_lead_lag",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .withColumn("us", expr("unix_micros(ts)"))
          .withColumn("gap_prev_us", col("us") - lag(col("us"), 1).over(w))
          .withColumn("gap_next_us", lead(col("us"), 1).over(w) - col("us"))
          .withColumn("quartile", ntile(4).over(w))
          .select("event_id", "user_id", "gap_prev_us", "gap_next_us", "quartile")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_prev_us,
               LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_next_us,
               NTILE(4) OVER w AS quartile
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // first/last/nth_value per user session window — the remaining
    // §2.6 navigation functions: entry event, latest event (running,
    // default frame), and second event per user.
    Q(
      "w8_first_last",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wFull = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        Tables.events(s, d)
          .withColumn("entry_event", first(col("event_type")).over(wFull))
          .withColumn("final_event", last(col("event_type")).over(wFull))
          .withColumn("second_event", nth_value(col("event_type"), 2).over(wFull))
          .select("event_id", "user_id", "entry_event", "final_event",
            "second_event")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id,
               FIRST_VALUE(event_type) OVER w AS entry_event,
               LAST_VALUE(event_type) OVER w AS final_event,
               NTH_VALUE(event_type, 2) OVER w AS second_event
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // RANGE frame (vs w5/w6's ROWS frames): per-user trailing-1-hour
    // event-value sum keyed by event TIME, not row count — peers at the
    // same timestamp aggregate together and gaps shrink the window.
    // Exact integer-second range on both engines.
    Q(
      "w9_range_frame",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_sec"))
          .rangeBetween(-3600L, 0L)
        Tables.events(s, d)
          .withColumn("ts_sec", expr("unix_micros(ts) div 1000000"))
          .withColumn("trailing_1h",
            sum(col("value").cast(
              org.apache.spark.sql.types.DecimalType(28, 6))).over(w)
              .cast("double"))
          .select("event_id", "user_id", "ts_sec", "trailing_1h")
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id, user_id, ts_sec,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                 PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS trailing_1h
        FROM (SELECT event_id, user_id, epoch_us(ts) // 1000000 AS ts_sec,
                     value
              FROM events)
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // Distribution ranks (the remaining ANSI window trio): percent_rank
    // / cume_dist / ntile(10) per priority group over a total tie-break
    // order (price, key), so every value — including the rank-based
    // divisions — is engine-independent. Deciles are the
    // length-bucketing primitive a curation pipeline uses for balanced
    // batch construction.
    Q(
      "w11_distribution_ranks",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cum_dist"),
            ntile(10).over(w).as("decile"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_orderpriority,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cum_dist,
               CAST(ntile(10) OVER w AS INTEGER) AS decile
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderkey""")),

    // ----------------------------------------------------------------
    // Funnel analysis: per user, the first click → first subsequent
    // purchase → conversion flag and time-to-convert — the sequence
    // pattern behind every conversion dashboard, as two min-aggregates
    // and a conditional join (no per-row state machine).
    Q(
      "f1_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
        val firstClick = ev.filter(col("event_type") === "click")
          .groupBy("user_id").agg(min(col("ts")).as("first_click_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"))
        firstClick.join(purchases, Seq("user_id"), "left")
          .withColumn("p_ts_after",
            when(col("p_ts") >= col("first_click_ts"), col("p_ts")))
          .groupBy("user_id", "first_click_ts")
          .agg(min(col("p_ts_after")).as("first_purchase_ts"))
          .withColumn("converted", col("first_purchase_ts").isNotNull)
          .withColumn("us_to_convert",
            expr("unix_micros(first_purchase_ts)")
              - expr("unix_micros(first_click_ts)"))
          .select(col("user_id"),
            date_format(col("first_click_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
              .as("first_click"),
            col("converted"), col("us_to_convert"))
          .orderBy("user_id")
      },
      Some("""
        WITH fc AS (
          SELECT user_id, MIN(ts) AS first_click_ts
          FROM events WHERE event_type = 'click' GROUP BY user_id),
        fp AS (
          SELECT fc.user_id, fc.first_click_ts,
                 MIN(CASE WHEN p.ts >= fc.first_click_ts THEN p.ts END)
                   AS first_purchase_ts
          FROM fc LEFT JOIN events p
            ON p.user_id = fc.user_id AND p.event_type = 'purchase'
          GROUP BY fc.user_id, fc.first_click_ts)
        SELECT user_id,
               strftime(first_click_ts, '%Y-%m-%d %H:%M:%S.%f') AS first_click,
               first_purchase_ts IS NOT NULL AS converted,
               epoch_us(first_purchase_ts) - epoch_us(first_click_ts)
                 AS us_to_convert
        FROM fp
        ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // Reference-exact scalar score suite (utils/data_transformer.py +
    // personal_repos_silver_to_gold.py): the 50/30/20 activity
    // composite, raw stars/days momentum, six-tier popularity,
    // active/stable/dormant status, and the 0-1 health score → A-F
    // grade — inputs derived deterministically from `part`.
    Q(
      "p9_ref_scores",
      (s, d) => {
        val k = col("p_partkey")
        Tables.part(s, d)
          .withColumn("stars", (k * 37) % 20000)
          .withColumn("days_push", k % 400)
          .withColumn("days_upd", k % 150)
          .withColumn("open_issues", k % 50)
          .withColumn("age_days", k % 2200)
          .withColumn("quality01", (k % 101).cast("double") / 100.0)
          .withColumn("velocity", (k % 13).cast("double") / 10.0)
          .withColumn("activity_score", Scores.activityScoreRef(
            col("days_push"), col("days_upd"), col("open_issues"), col("stars")))
          .withColumn("momentum", Scores.momentumScoreRef(col("stars"), col("age_days")))
          .withColumn("tier", Scores.popularityTierRef(col("stars")))
          .withColumn("status", Scores.activityStatus(col("days_push")))
          .withColumn("health_score", round(Scores.healthScoreRef(
            col("quality01"), col("velocity"), col("days_push") <= 30), 6))
          .withColumn("health_grade", Scores.healthGradeRef(col("health_score")))
          .select("p_partkey", "activity_score", "momentum", "tier",
            "status", "health_score", "health_grade")
          .orderBy("p_partkey")
      },
      Some("""
        WITH base AS (
          SELECT p_partkey,
                 (p_partkey * 37) % 20000 AS stars,
                 p_partkey % 400 AS days_push,
                 p_partkey % 150 AS days_upd,
                 p_partkey % 50 AS open_issues,
                 p_partkey % 2200 AS age_days,
                 CAST(p_partkey % 101 AS DOUBLE) / 100.0 AS quality01,
                 CAST(p_partkey % 13 AS DOUBLE) / 10.0 AS velocity
          FROM part),
        scored AS (
          SELECT p_partkey,
            round(
              (CASE WHEN days_push <= 7 THEN 50.0 WHEN days_push <= 30 THEN 30.0
                    WHEN days_push <= 90 THEN 10.0 ELSE CAST(0.0 AS DOUBLE) END)
              + (CASE WHEN days_upd <= 7 THEN 30.0 WHEN days_upd <= 30 THEN 20.0
                      WHEN days_upd <= 90 THEN 5.0 ELSE 0.0 END)
              + (CASE WHEN CAST(open_issues AS DOUBLE) / GREATEST(CAST(stars AS DOUBLE), 1.0) < 0.1 THEN 20.0
                      WHEN CAST(open_issues AS DOUBLE) / GREATEST(CAST(stars AS DOUBLE), 1.0) < 0.3 THEN 10.0
                      ELSE 0.0 END), 1) AS activity_score,
            CASE WHEN age_days <= 0 THEN 0.0
                 ELSE round(CAST(stars AS DOUBLE) / CAST(age_days AS DOUBLE), 4)
            END AS momentum,
            CASE WHEN stars >= 10000 THEN 'viral' WHEN stars >= 5000 THEN 'popular'
                 WHEN stars >= 1000 THEN 'notable' WHEN stars >= 100 THEN 'emerging'
                 WHEN stars >= 10 THEN 'developing' ELSE 'new' END AS tier,
            CASE WHEN days_push <= 7 THEN 'active' WHEN days_push <= 30 THEN 'stable'
                 ELSE 'dormant' END AS status,
            round(LEAST(CAST(1.0 AS DOUBLE),
              quality01 * 0.4 + velocity * 0.3 +
              CASE WHEN days_push <= 30 THEN 0.3 ELSE 0.0 END), 6) AS health_score
          FROM base)
        SELECT p_partkey, activity_score, momentum, tier, status, health_score,
               CASE WHEN health_score >= 0.8 THEN 'A' WHEN health_score >= 0.6 THEN 'B'
                    WHEN health_score >= 0.4 THEN 'C' WHEN health_score >= 0.2 THEN 'D'
                    ELSE 'F' END AS health_grade
        FROM scored
        ORDER BY p_partkey""")),

    // ----------------------------------------------------------------
    // Explicit GROUPING SETS (the two one-column marginals + grand
    // total, none of the pair combos rollup/cube produce) through the
    // SQL front-end — the one query pack entry exercising spark.sql()
    // end to end. Same single Expand + hash-agg plan as a11/a12.
    Q(
      "a13_grouping_sets",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
        s.sql("""
          SELECT COALESCE(l_returnflag, 'ALL') AS flag,
                 COALESCE(l_linestatus, 'ALL') AS status,
                 COUNT(*) AS n_rows,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                   AS sum_qty
          FROM lineitem_v
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY flag, status""")
      },
      Some(s"""
        SELECT COALESCE(l_returnflag, 'ALL') AS flag,
               COALESCE(l_linestatus, 'ALL') AS status,
               COUNT(*) AS n_rows,
               ${dsumSql("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY flag, status""")),

    // ----------------------------------------------------------------
    // Cube over the A1 keys — every subtotal combination (including the
    // column-wise marginals ROLLUP skips) in one Expand + hash-agg pass.
    Q(
      "a12_cube_sets",
      (s, d) =>
        Tables.lineitem(s, d)
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            dsum(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("n_rows"), col("sum_qty"))
          .orderBy("flag", "status"),
      Some(s"""
        SELECT COALESCE(l_returnflag, 'ALL') AS flag,
               COALESCE(l_linestatus, 'ALL') AS status,
               COUNT(*) AS n_rows,
               ${dsumSql("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY flag, status""")),

    // ----------------------------------------------------------------
    // Unpivot (melt) — p10's dual: wide metric columns to long
    // (key, metric, value) rows, the shape feature-store ingestion
    // wants. Pure projection + Expand, no shuffle.
    Q(
      "p12_unpivot",
      (s, d) =>
        Tables.part(s, d)
          .select(col("p_partkey"),
            col("p_retailprice").cast("double").as("retail_price"),
            col("p_size").cast("double").as("size"))
          .unpivot(Array(col("p_partkey")),
            Array(col("retail_price"), col("size")), "metric", "value")
          .orderBy("p_partkey", "metric"),
      Some("""
        SELECT p_partkey, 'retail_price' AS metric,
               CAST(p_retailprice AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'size', CAST(p_size AS DOUBLE)
        FROM part
        ORDER BY p_partkey, metric""")),

    // ----------------------------------------------------------------
    // Pivot: daily event counts spread into one column per event type
    // (explicit value list => no driver-side distinct scan; Spark plans
    // a single hash-agg over (day, type) then a final pivot agg).
    Q(
      "p10_pivot",
      (s, d) => {
        val counted = Tables.events(s, d)
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .pivot("event_type", eventTypes)
          .agg(count(lit(1)))
        counted.select(col("day") +:
          eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("day")
      },
      Some(s"""
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               ${eventTypes.map(t =>
                  s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS $t")
                 .mkString(",\n               ")}
        FROM events
        GROUP BY 1
        ORDER BY day""")),

    // ----------------------------------------------------------------
    // Salted two-stage HOLISTIC aggregation (§4 skew notes, j9's dual
    // for aggregations): algebraic aggregates (sum/count/avg) never
    // need salting — Spark's map-side partials already shrink every
    // partition to one row per group. The state-accumulating
    // (holistic) aggregates DO: collect_set / exact-distinct state
    // grows with group size, so one hot group concentrates its whole
    // state on one reducer. Stage 1 splits each group across 16 salts
    // (groupBy(key, salt) → bounded per-salt sets); stage 2 merges the
    // 16 partial sets per group (flatten + array_distinct). The salt
    // must be invisible in the result — the oracle is the PLAIN
    // distinct aggregation.
    Q(
      "a15_salted_collect",
      (s, d) =>
        Tables.lineitem(s, d)
          .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
          .groupBy("l_returnflag", "salt")
          .agg(collect_set(col("l_suppkey")).as("partial_supp"))
          .groupBy("l_returnflag")
          .agg(array_sort(array_distinct(flatten(
            collect_list(col("partial_supp"))))).as("supp"))
          .select(col("l_returnflag"),
            size(col("supp")).as("n_supp"),
            concat_ws(",",
              transform(col("supp"), x => x.cast("string"))).as("supp_csv"))
          .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               CAST(COUNT(*) AS INTEGER) AS n_supp,
               array_to_string(list(l_suppkey ORDER BY l_suppkey),
                               ',') AS supp_csv
        FROM (SELECT DISTINCT l_returnflag, l_suppkey FROM lineitem)
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ----------------------------------------------------------------
    // Heavy hitters via count-min sketch (a14's pattern, applied to
    // per-key counts): Spark's builtin `count_min_sketch` aggregate
    // builds the sketch in one pass (map-side partials, fixed-size
    // merge — at 100 TB the sketch replaces a full per-key shuffle when
    // only the heavy tail matters); the library's `cms_estimate` probes
    // it per candidate key from a broadcast single-row frame. Sketch
    // cell layout is engine-specific, so the emitted columns are the
    // EXACT count and a bounded-error VERDICT: est is never below the
    // true count (CMS guarantee) and within 3·eps·N above it (eps
    // 0.0005, depth 7 → overshoot odds are (1/6)^7 per key; seed fixed
    // → deterministic). DuckDB predicts the all-ones frame; a drifting
    // sketch flips a row and the gate hash catches it.
    Q(
      "h1_heavy_hitters",
      (s, d) => {
        import graft.functions.SketchFunctions.cmsEstimate
        val ev = Tables.events(s, d)
        val skRow = broadcast(ev.agg(
          count_min_sketch(col("user_id"), lit(0.0005d), lit(0.99d), lit(42))
            .as("sk"),
          count(lit(1)).as("total")))
        ev.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"))
          .filter(col("n_events") >= 75) // heavy-hitter band (top ~17%)
          .join(skRow) // 1-row broadcast: map-side probe
          .withColumn("est", cmsEstimate(col("sk"), col("user_id")))
          .withColumn("within_bound",
            when(col("est") >= col("n_events") &&
              col("est") <= col("n_events") +
                ceil(lit(3 * 0.0005d) * col("total")), 1).otherwise(0))
          .select("user_id", "n_events", "within_bound")
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id, COUNT(*) AS n_events,
               CAST(1 AS INTEGER) AS within_bound
        FROM events
        GROUP BY user_id
        HAVING COUNT(*) >= 75
        ORDER BY user_id""")),

    // ----------------------------------------------------------------
    // Column profile (pr1): the one-pass data-quality summary every
    // ingest runs before anything else — per column: null count, exact
    // distinct count, min/max (computed on the NATIVE type, then
    // rendered as a 32-char string so numeric order is preserved and
    // long text stays bounded). One aggregation over one scan (the
    // multi-distinct Expand multiplies map-side rows by the column
    // count but keeps the single-pass shape — the audit runs once per
    // ingest, not per query), then a `stack` unpivot of the 1-row
    // result into the (column, measures) report.
    Q(
      "pr1_column_profile",
      (s, d) => {
        val df = Tables.documents(s, d)
        val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
        val aggs = cols.flatMap { c => Seq(
          (count(lit(1)) - count(col(c))).as(s"nn_$c"),
          countDistinct(col(c)).as(s"nd_$c"),
          substring(min(col(c)).cast("string"), 1, 32).as(s"mn_$c"),
          substring(max(col(c)).cast("string"), 1, 32).as(s"mx_$c")) }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val stacked = cols
          .map(c => s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
        one.selectExpr(s"stack(${cols.size}, $stacked) " +
            "as (col_name, n_nulls, n_distinct, min_val, max_val)")
          .orderBy("col_name")
      },
      Some("""
        SELECT * FROM (
          SELECT 'doc_id' AS col_name,
                 COUNT(*) - COUNT(doc_id) AS n_nulls,
                 COUNT(DISTINCT doc_id) AS n_distinct,
                 substr(CAST(MIN(doc_id) AS VARCHAR), 1, 32) AS min_val,
                 substr(CAST(MAX(doc_id) AS VARCHAR), 1, 32) AS max_val
          FROM documents
          UNION ALL
          SELECT 'text', COUNT(*) - COUNT(text), COUNT(DISTINCT text),
                 substr(MIN(text), 1, 32), substr(MAX(text), 1, 32)
          FROM documents
          UNION ALL
          SELECT 'lang', COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
                 substr(MIN(lang), 1, 32), substr(MAX(lang), 1, 32)
          FROM documents
          UNION ALL
          SELECT 'source', COUNT(*) - COUNT(source), COUNT(DISTINCT source),
                 substr(MIN(source), 1, 32), substr(MAX(source), 1, 32)
          FROM documents
          UNION ALL
          SELECT 'n_chars', COUNT(*) - COUNT(n_chars),
                 COUNT(DISTINCT n_chars),
                 substr(CAST(MIN(n_chars) AS VARCHAR), 1, 32),
                 substr(CAST(MAX(n_chars) AS VARCHAR), 1, 32)
          FROM documents)
        ORDER BY col_name""")),

    // ----------------------------------------------------------------
    // Declarative expectations audit (dq1): the contract gate an ingest
    // runs before promoting a batch — six rule families (not-null,
    // numeric range, allowed values, key uniqueness, JSON field shape,
    // referential integrity) each reporting its violation count and a
    // pass flag. The five row-level rules ride ONE aggregation over one
    // scan (conditional sums + a distinct count); referential integrity
    // is a key-only anti-join counted to a single row — at 100 TB
    // that's one pass for all row rules and one keyed join, never a
    // rule-per-scan loop.
    Q(
      "dq1_expectations",
      (s, d) => {
        val ev = Tables.events(s, d)
        val kStr = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
        val agg = ev.agg(
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("v_null"),
          sum(when(col("value") < 0 || col("value") > 100, 1L)
            .otherwise(0L)).as("v_range"),
          sum(when(not(col("event_type").isin(
            "click", "view", "signup", "purchase", "error")), 1L)
            .otherwise(0L)).as("v_type"),
          (count(lit(1)) - countDistinct(col("event_id"))).as("v_unique"),
          sum(when(kStr === "" || kStr.cast("long") > 99, 1L)
            .otherwise(0L)).as("v_props"))
        val rowRules = agg.selectExpr(
          "stack(5, 'event_id_unique', v_unique, " +
            "'event_type_allowed', v_type, 'props_k_in_range', v_props, " +
            "'value_in_range', v_range, 'value_not_null', v_null) " +
            "as (rule, n_violations)")
        val ref = ev.select(col("user_id"))
          .join(Tables.customer(s, d).select(col("c_custkey").as("user_id")),
            Seq("user_id"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit("user_id_referential").as("rule"), col("n_violations"))
        rowRules.unionByName(ref)
          .withColumn("passed", when(col("n_violations") === 0, 1).otherwise(0))
          .orderBy("rule")
      },
      Some("""
        WITH k AS (
          SELECT *, regexp_extract(props, '"k": (\d+)', 1) AS ks
          FROM events),
        agg AS (
          SELECT
            CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS v_null,
            CAST(SUM(CASE WHEN value < 0 OR value > 100 THEN 1 ELSE 0 END)
              AS BIGINT) AS v_range,
            CAST(SUM(CASE WHEN event_type NOT IN
              ('click','view','signup','purchase','error') THEN 1 ELSE 0 END)
              AS BIGINT) AS v_type,
            COUNT(*) - COUNT(DISTINCT event_id) AS v_unique,
            CAST(SUM(CASE WHEN ks = '' OR TRY_CAST(ks AS BIGINT) > 99
              THEN 1 ELSE 0 END) AS BIGINT) AS v_props
          FROM k),
        ref AS (
          SELECT COUNT(*) AS n FROM events e
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = e.user_id))
        SELECT rule, n_violations,
               CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS passed
        FROM (
          SELECT 'event_id_unique' AS rule, v_unique AS n_violations FROM agg
          UNION ALL SELECT 'event_type_allowed', v_type FROM agg
          UNION ALL SELECT 'props_k_in_range', v_props FROM agg
          UNION ALL SELECT 'value_in_range', v_range FROM agg
          UNION ALL SELECT 'value_not_null', v_null FROM agg
          UNION ALL SELECT 'user_id_referential', n FROM ref) t
        ORDER BY rule""")),

    // ----------------------------------------------------------------
    // ANSI SQL text surface (sql1): ONE literal SQL string executed
    // verbatim by BOTH engines — Spark runs it through spark.sql over
    // temp views; DuckDB runs the identical text as the oracle. This
    // gates the full text→Catalyst path (parser, analyzer, decimal
    // semantics, ORDER BY+LIMIT → TakeOrdered) rather than the
    // DataFrame DSL: a reference user's ad-hoc SQL runs unchanged.
    // Revenue accumulates through exact DECIMAL (the engine-independent
    // double-sum discipline) with a total tie-break order.
    Q(
      "sql1_ansi_revenue",
      (s, d) => {
        Seq("orders", "lineitem").foreach { t =>
          Tables.table(s, d, t).createOrReplaceTempView(t)
        }
        s.sql(Sql1Text)
      },
      Some(Sql1Text)),

    // ----------------------------------------------------------------
    // sql2: the ANSI text surface with the OTHER hard constructs — a
    // CTE, a window over a joined aggregate, and a rank filter — one
    // literal string again run verbatim by both engines. Together with
    // sql1 this covers the text→Catalyst path for aggregate, join,
    // CTE, window, subquery-filter, ORDER/LIMIT shapes.
    Q(
      "sql2_ansi_segment_top",
      (s, d) => {
        Seq("orders", "customer").foreach { t =>
          Tables.table(s, d, t).createOrReplaceTempView(t)
        }
        s.sql(Sql2Text)
      },
      Some(Sql2Text)),

    // ----------------------------------------------------------------
    // sql3: RECURSIVE CTE parity (Spark 4's WITH RECURSIVE) — a forest
    // walk over the implicit part tree (parent = ⌊key/10⌋), one literal
    // string both engines execute verbatim: anchor (keys < 10, depth 0)
    // + recursive child join carrying the root. Integer division is
    // spelled FLOOR(x/10) because `div` vs `//` would fork the text.
    // Every part is reachable, so the gate covers all rows, not a
    // sampled frontier.
    Q(
      "sql3_recursive_walk",
      (s, d) => {
        Tables.table(s, d, "part").createOrReplaceTempView("part")
        s.sql(Sql3Text)
      },
      Some(Sql3Text)),

    // ----------------------------------------------------------------
    // sql4: correlated LATERAL subquery with ORDER BY + LIMIT — the
    // top-1-per-entity idiom as a join operator, decorrelated by
    // Catalyst into a ranked join rather than per-row re-execution.
    // One literal string, verbatim on both engines; customers without
    // orders drop out (inner lateral) identically.
    Q(
      "sql4_lateral_top_order",
      (s, d) => {
        Seq("orders", "customer").foreach { t =>
          Tables.table(s, d, t).createOrReplaceTempView(t)
        }
        s.sql(Sql4Text)
      },
      Some(Sql4Text)),

    // ----------------------------------------------------------------
    // INTERVAL-OVERLAP join (j14): interval × interval, the missing
    // sibling of j7's point-in-interval — "which supplier activity
    // windows overlap which promo windows". A naive theta join
    // evaluates |A|×|B| overlap predicates. Scale shape: explode each
    // interval into the ≤2–3 MONTH BUCKETS it spans, equi-join on the
    // bucket (plain shuffled/broadcast hash join), apply the exact
    // overlap predicate after — and count each qualifying pair EXACTLY
    // once without a distinct by keeping only the bucket that contains
    // greatest(a_start, b_start) (which every overlapping pair's two
    // intervals both span). The oracle is algorithm-independent: the
    // plain overlap join.
    Q(
      "j14_interval_overlap",
      (s, d) => {
        val sup = Tables.orders(s, d)
          .filter(col("o_orderkey") % 53 === 0) // sampled activity windows
          .select(col("o_orderkey"),
            col("o_orderdate").cast("timestamp").as("a_start"))
          .withColumn("a_end", col("a_start") + expr("INTERVAL 30 DAYS"))
        val promo = Tables.orders(s, d)
          .select(date_trunc("month", col("o_orderdate")).as("b_start"))
          .distinct()
          .withColumn("b_end", col("b_start") + expr("INTERVAL 45 DAYS"))
        def withBuckets(df: org.apache.spark.sql.DataFrame,
            start: String, end: String) =
          df.withColumn("bucket", explode(sequence(
            date_trunc("month", col(start)),
            date_trunc("month", col(end) - expr("INTERVAL 1 DAY")),
            expr("INTERVAL 1 MONTH"))))
        withBuckets(sup, "a_start", "a_end")
          .join(broadcast(withBuckets(promo, "b_start", "b_end")), "bucket")
          .filter(col("a_start") < col("b_end") &&
            col("b_start") < col("a_end") &&
            col("bucket") ===
              date_trunc("month", greatest(col("a_start"), col("b_start"))))
          .groupBy(date_format(col("b_start"), "yyyy-MM-dd").as("promo_day"))
          .agg(count(lit(1)).as("n_windows"),
            min(col("o_orderkey")).as("min_key"),
            max(col("o_orderkey")).as("max_key"))
          .orderBy("promo_day")
      },
      Some("""
        WITH sup AS (
          SELECT o_orderkey,
                 CAST(o_orderdate AS TIMESTAMP) AS a_start,
                 CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS a_end
          FROM orders WHERE o_orderkey % 53 = 0),
        promo AS (
          SELECT DISTINCT date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
            AS b_start
          FROM orders),
        p2 AS (SELECT b_start, b_start + INTERVAL 45 DAY AS b_end FROM promo)
        SELECT strftime(b_start, '%Y-%m-%d') AS promo_day,
               COUNT(*) AS n_windows,
               MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        FROM sup JOIN p2 ON a_start < b_end AND b_start < a_end
        GROUP BY b_start ORDER BY promo_day""")),

    // ----------------------------------------------------------------
    // Wilson lower confidence bound per source (a21): rank document
    // sources by quality-proportion with the small-sample correction —
    // the domain-curation decision rule (a source with 3/3 good docs
    // must NOT outrank one with 480/500). The bound uses only
    // + − × ÷ √, ALL of which IEEE-754 requires correctly rounded
    // (unlike log/pow), so the identical expression shape evaluates
    // bit-identically on both engines — the ts2 fixed-shape-IEEE
    // discipline applied to an inferential statistic.
    Q(
      "a21_wilson_quality",
      (s, d) => {
        val z2 = "(1.96 * 1.96)"
        val f = "(p + " + z2 + " / (2.0 * n) - 1.96 * sqrt((p * (1.0 - p) + " +
          z2 + " / (4.0 * n)) / n)) / (1.0 + " + z2 + " / n)"
        Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("n_chars") >= 300, 1)).as("n_good"))
          .withColumn("n", col("n_docs").cast("double"))
          .withColumn("p", col("n_good").cast("double") / col("n"))
          .withColumn("wilson_lower", expr(f))
          .select("source", "n_docs", "n_good", "wilson_lower")
          .orderBy("source")
      },
      Some("""
        WITH g AS (
          SELECT source, COUNT(*) AS n_docs,
                 COUNT(CASE WHEN n_chars >= 300 THEN 1 END) AS n_good
          FROM documents GROUP BY source),
        x AS (
          SELECT source, n_docs, n_good,
                 CAST(n_docs AS DOUBLE) AS n,
                 CAST(n_good AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p
          FROM g)
        SELECT source, n_docs, n_good,
               (p + (1.96 * 1.96) / (2.0 * n) - 1.96 * sqrt((p * (1.0 - p) +
                 (1.96 * 1.96) / (4.0 * n)) / n)) / (1.0 + (1.96 * 1.96) / n)
                 AS wilson_lower
        FROM x ORDER BY source""")),

    // ----------------------------------------------------------------
    // OOV-rate tokenizer audit per source (t35): fraction of token
    // OCCURRENCES outside a min-frequency-5 vocabulary — the
    // vocabulary-coverage check run before committing a tokenizer.
    // Scale shape: occurrences collapse to (source, token) partial
    // counts FIRST (one map-side-combining hash agg), the global vocab
    // derives from those partials (second agg over distinct tokens),
    // and the membership join runs on distinct (source, token) pairs —
    // never raw occurrences. A frequency threshold instead of top-k
    // sidesteps tie-order nondeterminism entirely.
    Q(
      "t35_oov_rate",
      (s, d) => {
        val st = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("token"))
          .groupBy("source", "token")
          .agg(count(lit(1)).as("n"))
        val vocab = st.groupBy("token").agg(sum(col("n")).as("cnt"))
        st.join(vocab, "token")
          .groupBy("source")
          .agg(sum(col("n")).as("n_tokens"),
            sum(when(col("cnt") < 5, col("n")).otherwise(lit(0L))).as("n_oov"))
          .withColumn("oov_rate",
            col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .select("source", "n_tokens", "n_oov", "oov_rate")
          .orderBy("source")
      },
      Some("""
        WITH st AS (
          SELECT source, token, COUNT(*) AS n
          FROM (SELECT source, UNNEST(string_split(text, ' ')) AS token
                FROM documents)
          GROUP BY source, token),
        vocab AS (SELECT token, SUM(n) AS cnt FROM st GROUP BY token)
        SELECT st.source,
               CAST(SUM(st.n) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN vocab.cnt < 5 THEN st.n ELSE 0 END) AS BIGINT)
                 AS n_oov,
               CAST(SUM(CASE WHEN vocab.cnt < 5 THEN st.n ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(st.n) AS DOUBLE) AS oov_rate
        FROM st JOIN vocab ON st.token = vocab.token
        GROUP BY st.source ORDER BY st.source""")))

  /** The sql4 query text (same both-engines discipline as sql1–sql3). */
  private def Sql4Text = """
    SELECT c_custkey, c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
    WHERE c.c_custkey <= 200
    ORDER BY c_custkey"""

  /** The sql3 query text (same both-engines discipline as sql1/sql2). */
  private def Sql3Text = """
    WITH RECURSIVE walk AS (
      SELECT p_partkey AS node, p_partkey AS root, 0 AS depth
      FROM part WHERE p_partkey < 10
      UNION ALL
      SELECT p.p_partkey, w.root, w.depth + 1
      FROM part p JOIN walk w
        ON CAST(FLOOR(p.p_partkey / 10) AS BIGINT) = w.node
      WHERE p.p_partkey >= 10)
    SELECT node, root, CAST(depth AS INTEGER) AS depth
    FROM walk ORDER BY node"""

  /** The sql2 query text (same both-engines discipline as sql1). */
  private def Sql2Text = """
    WITH cust_rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS rev,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_custkey)
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, rev, n_orders,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
               ORDER BY rev DESC, c_custkey) AS INTEGER) AS rnk
      FROM customer JOIN cust_rev ON c_custkey = o_custkey)
    WHERE rnk <= 3
    ORDER BY c_mktsegment, rnk"""

  /** The sql1 query text — a single ANSI string both engines accept
    * (a def: object-init order must not matter to the `all` Seq). */
  private def Sql1Text = """
    SELECT o_orderkey, o_orderpriority,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
             AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus <> 'F' AND l_discount > 0.02
    GROUP BY o_orderkey, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10"""
}
