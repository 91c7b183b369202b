package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.{AsOfJoin, Contamination, InvertedIndex}
import graft.pipeline.Activity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data-pipeline pack #2: as-of joins, TF-IDF, deterministic
  * train/test splits, exact medians — operators a 100 TB corpus
  * pipeline needs beyond the reference's own surface.
  */
object TrainingQueries {

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // As-of join: attach the most recent per-user hourly snapshot to
    // every event. Spark: union-and-carry (one shuffle); oracle: native
    // ASOF JOIN.
    Q(
      "j6_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val snaps = ev.groupBy(col("user_id"),
            date_trunc("hour", col("ts")).as("hour_start"))
          .agg(max(col("value")).as("snapshot_max"))
        val left = ev.select("event_id", "user_id", "ts", "value")
        AsOfJoin.asOf(left, snaps, "user_id", "ts", "hour_start")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
            col("value"), col("snapshot_max"))
          .orderBy("event_id")
      },
      Some("""
        WITH snaps AS (
          SELECT user_id, date_trunc('hour', ts) AS hour_start,
                 MAX(value) AS snapshot_max
          FROM events GROUP BY 1, 2)
        SELECT event_id, l.user_id,
               strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
               l.value, snaps.snapshot_max
        FROM events l
        ASOF JOIN snaps
          ON l.user_id = snaps.user_id AND snaps.hour_start <= l.ts
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // Forward as-of with tolerance (pandas merge_asof parity): attach
    // the NEXT per-user hourly snapshot to each event, but only when it
    // starts within 30 minutes — the "what happened next, soon" join
    // (lead-time attribution, next-checkpoint lookup). Same single
    // union-and-carry shuffle, reversed order; tolerance is a
    // post-carry null-out on exact integer-micros arithmetic. Oracle:
    // DuckDB's native forward ASOF (<=) + the same CASE bound.
    Q(
      "j10_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
        val snaps = ev.groupBy(col("user_id"),
            date_trunc("hour", col("ts")).as("hour_start"))
          .agg(max(col("value")).as("snapshot_max"))
        val left = ev.select("event_id", "user_id", "ts", "value")
        AsOfJoin.asOf(left, snaps, "user_id", "ts", "hour_start",
          direction = "forward", toleranceSec = Some(1800.0))
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
            col("value"), col("snapshot_max"))
          .orderBy("event_id")
      },
      Some("""
        WITH snaps AS (
          SELECT user_id, date_trunc('hour', ts) AS hour_start,
                 MAX(value) AS snapshot_max
          FROM events GROUP BY 1, 2)
        SELECT event_id, l.user_id,
               strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
               l.value,
               CASE WHEN epoch_us(snaps.hour_start) - epoch_us(l.ts)
                         <= 1800 * 1000000
                    THEN snaps.snapshot_max END AS snapshot_max
        FROM events l
        ASOF LEFT JOIN snaps
          ON l.user_id = snaps.user_id AND l.ts <= snaps.hour_start
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // NEAREST-direction as-of (j13): merge_asof(direction='nearest')
    // parity, completing the as-of family (j6 backward, j10 forward).
    // Composed from the same union-and-carry operator run both ways —
    // two key-partitioned shuffles + one event_id equi-join, never a
    // |Δt| theta join — choosing the smaller absolute distance with a
    // documented tie → backward. The oracle composes DuckDB's native
    // backward and forward ASOF joins with the identical choice rule:
    // all arithmetic in exact integer micros.
    Q(
      "j13_asof_nearest",
      (s, d) => {
        val ev = Tables.events(s, d)
        val snaps = ev.groupBy(col("user_id"),
            date_trunc("hour", col("ts")).as("hour_start"))
          .agg(max(col("value")).as("snapshot_max"))
          .withColumn("snap_ts", col("hour_start"))
        val left = ev.select("event_id", "user_id", "ts", "value")
        def side(dir: String, p: String) =
          AsOfJoin.asOf(left, snaps, "user_id", "ts", "hour_start",
              direction = dir)
            .select(col("event_id"),
              col("snapshot_max").as(s"${p}_max"), col("snap_ts").as(s"${p}_ts"))
        val b = side("backward", "b")
        val f = side("forward", "f")
        val db = unix_micros(col("ts")) - unix_micros(col("b_ts"))
        val df_ = unix_micros(col("f_ts")) - unix_micros(col("ts"))
        val useB = col("f_ts").isNull || (col("b_ts").isNotNull && db <= df_)
        left.join(b, "event_id").join(f, "event_id")
          .select(
            col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
            when(useB, col("b_max")).otherwise(col("f_max")).as("nearest_max"),
            when(useB, db).otherwise(df_).as("delta_us"),
            when(useB, "b").otherwise("f").as("dir"))
          .orderBy("event_id")
      },
      Some("""
        WITH snaps AS (
          SELECT user_id, date_trunc('hour', ts) AS hour_start,
                 MAX(value) AS snapshot_max
          FROM events GROUP BY 1, 2),
        b AS (
          SELECT event_id, snaps.hour_start AS b_ts,
                 snaps.snapshot_max AS b_max
          FROM events l ASOF LEFT JOIN snaps
            ON l.user_id = snaps.user_id AND snaps.hour_start <= l.ts),
        f AS (
          SELECT event_id, snaps.hour_start AS f_ts,
                 snaps.snapshot_max AS f_max
          FROM events l ASOF LEFT JOIN snaps
            ON l.user_id = snaps.user_id AND l.ts <= snaps.hour_start)
        SELECT l.event_id, l.user_id,
               strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
               CASE WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND
                      epoch_us(l.ts) - epoch_us(b_ts)
                        <= epoch_us(f_ts) - epoch_us(l.ts))
                    THEN b_max ELSE f_max END AS nearest_max,
               CASE WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND
                      epoch_us(l.ts) - epoch_us(b_ts)
                        <= epoch_us(f_ts) - epoch_us(l.ts))
                    THEN epoch_us(l.ts) - epoch_us(b_ts)
                    ELSE epoch_us(f_ts) - epoch_us(l.ts) END AS delta_us,
               CASE WHEN f_ts IS NULL OR (b_ts IS NOT NULL AND
                      epoch_us(l.ts) - epoch_us(b_ts)
                        <= epoch_us(f_ts) - epoch_us(l.ts))
                    THEN 'b' ELSE 'f' END AS dir
        FROM events l JOIN b USING (event_id) JOIN f USING (event_id)
        ORDER BY l.event_id""")),

    // ----------------------------------------------------------------
    // A7 via period-explode (the single-shuffle replacement of the
    // reference's per-period loop+union, personal_repos_bronze_to_
    // silver.py:578-630), producing the composite-key long format the
    // activity-metrics MERGE uses. Events mapped to activity shape.
    Q(
      "a8_activity_explode",
      (s, d) => {
        val ev = Tables.events(s, d)
        val activity = ev.select(
          col("user_id").as("repository_id"),
          when(col("event_type") === "click", "commit")
            .when(col("event_type") === "view", "issue")
            .otherwise("other").as("activity_type"),
          col("ts"),
          col("value").as("additions"),
          (col("value") * 0.5).as("deletions"))
        val pd = ev.agg(to_date(max(col("ts"))).as("pd"))
        Activity.activityMetrics(
          activity.crossJoin(broadcast(pd)), col("pd"))
          .withColumn("last_activity_at",
            date_format(col("last_activity_at"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
          .orderBy("repository_id", "measurement_period")
      },
      Some("""
        WITH m AS (SELECT CAST(MAX(ts) AS DATE) AS pd FROM events),
        act AS (
          SELECT user_id AS repository_id,
                 CASE WHEN event_type = 'click' THEN 'commit'
                      WHEN event_type = 'view' THEN 'issue'
                      ELSE 'other' END AS activity_type,
                 ts, value AS additions, value * 0.5 AS deletions
          FROM events),
        expanded AS (
          SELECT act.*, p AS period_days
          FROM act, m, UNNEST([7, 30, 90]) AS u(p)
          WHERE ts >= pd - p)
        SELECT repository_id,
               CAST(period_days AS VARCHAR) || 'd' AS measurement_period,
               COUNT(CASE WHEN activity_type = 'commit' THEN 1 END) AS commit_count,
               COUNT(CASE WHEN activity_type = 'issue' THEN 1 END) AS issue_count,
               COALESCE(CAST(SUM(CAST(additions AS DECIMAL(28,6))) AS DOUBLE), 0.0)
                 AS total_additions,
               COALESCE(CAST(SUM(CAST(deletions AS DECIMAL(28,6))) AS DOUBLE), 0.0)
                 AS total_deletions,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_activity_at
        FROM expanded
        GROUP BY 1, 2
        ORDER BY repository_id, measurement_period""")),

    // ----------------------------------------------------------------
    // TF-IDF over the document corpus: tf = in-doc term count,
    // idf = ln(N / df). log through libm differs by ulps across
    // engines => round(6).
    Q(
      "t5_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val tf = docs.select(col("doc_id"),
            explode(split(col("text"), " ")).as("word"))
          .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
        tf.join(df, "word").crossJoin(broadcast(n))
          .withColumn("tfidf",
            round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
          .select("doc_id", "word", "tf", "df", "tfidf")
          .orderBy("doc_id", "word")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents),
        tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id, tf.word, tf, df,
               round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        FROM tf JOIN df ON tf.word = df.word, n
        ORDER BY doc_id, tf.word""")),

    // ----------------------------------------------------------------
    // Deterministic train/test split: md5-derived bucket per doc (no
    // rand() — reproducible on any cluster, stable across reruns).
    Q(
      "t6_hash_split",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("bucket", expr(
            """(position(substr(md5(CAST(doc_id AS STRING)), 1, 1)
                 IN '0123456789abcdef') - 1) * 16
             + (position(substr(md5(CAST(doc_id AS STRING)), 2, 1)
                 IN '0123456789abcdef') - 1)"""))
          .withColumn("split",
            when(col("bucket") % 100 < 80, "train").otherwise("test"))
          .select("doc_id", "lang", "bucket", "split")
          .orderBy("doc_id"),
      Some("""
        SELECT doc_id, lang, bucket,
               CASE WHEN bucket % 100 < 80 THEN 'train' ELSE 'test' END AS split
        FROM (
          SELECT doc_id, lang,
                 (strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS bucket
          FROM documents)
        ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Stratified sampling: deterministic top-N per stratum ordered by a
    // content hash — reproducible train-subset selection without rand().
    Q(
      "t8_stratified_sample",
      (s, d) => {
        val w = Window.partitionBy("lang")
          .orderBy(md5(concat(lit("sample|"), col("doc_id").cast("string"))), col("doc_id"))
        Tables.documents(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 20)
          .select("lang", "rn", "doc_id", "n_chars")
          .orderBy("lang", "rn")
      },
      Some("""
        SELECT lang, rn, doc_id, n_chars
        FROM (
          SELECT lang, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY md5('sample|' || CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn
          FROM documents)
        WHERE rn <= 20
        ORDER BY lang, rn""")),

    // ----------------------------------------------------------------
    // Exact nearest-rank percentiles per group (p50/p90/p99) by
    // selection — no interpolation, no sketch, identical on any engine.
    // At 100 TB this is one range-partitioned sort per group key; for
    // sketch-budget cases approx_percentile is the documented upgrade
    // (ScaleVariantSpec covers the approx path).
    Q(
      "t9_percentiles",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt",
            count(lit(1)).over(Window.partitionBy("o_orderpriority")))
          .groupBy("o_orderpriority")
          .agg(
            max(when(col("rn") === ceil(col("cnt") * 0.5), col("o_totalprice")))
              .as("p50"),
            max(when(col("rn") === ceil(col("cnt") * 0.9), col("o_totalprice")))
              .as("p90"),
            max(when(col("rn") === ceil(col("cnt") * 0.99), col("o_totalprice")))
              .as("p99"),
            max(col("cnt")).as("n_orders"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority,
               MAX(CASE WHEN rn = CAST(ceil(cnt * 0.5) AS BIGINT)
                        THEN o_totalprice END) AS p50,
               MAX(CASE WHEN rn = CAST(ceil(cnt * 0.9) AS BIGINT)
                        THEN o_totalprice END) AS p90,
               MAX(CASE WHEN rn = CAST(ceil(cnt * 0.99) AS BIGINT)
                        THEN o_totalprice END) AS p99,
               MAX(cnt) AS n_orders
        FROM (
          SELECT o_orderpriority, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
          FROM orders)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ----------------------------------------------------------------
    // Exact per-group median (lower median) without percentile
    // functions whose interpolation differs across engines: total-order
    // row_number + element selection. Deterministic everywhere.
    Q(
      "t7_length_median",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val w = Window.partitionBy("lang")
          .orderBy(col("n_chars"), col("doc_id"))
        docs
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
          .filter(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("lang"), col("n_chars").as("median_chars"), col("cnt").as("n_docs"))
          .orderBy("lang")
      },
      Some("""
        SELECT lang, n_chars AS median_chars, cnt AS n_docs
        FROM (
          SELECT lang, n_chars, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY n_chars, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS cnt
          FROM documents)
        WHERE rn = (cnt + 1) // 2
        ORDER BY lang""")),

    // ----------------------------------------------------------------
    // t7/t9's sketch tier: percentile_approx (KLL-style quantile
    // sketch) replacing the per-group sort windows — ONE hash-agg pass
    // with map-side sketch merge instead of a range sort per group; the
    // shape that survives 100 TB where a full per-group sort won't.
    // Sketch internals are engine-specific, so the query emits
    // bounded-error VERDICTS: each approx percentile must land within
    // 2% of the exact interpolated percentile computed in the same
    // pass — an all-ones frame DuckDB predicts exactly. A drifting
    // sketch flips its verdict to 0 and the gate hash catches it; the
    // tight error curve stays pinned in ScaleVariantSpec at sf0.1.
    Q(
      "t14_approx_percentiles",
      (s, d) => {
        def ok(q: Double, name: String) = {
          val approx = percentile_approx(col("o_totalprice"), lit(q), lit(10000))
          val exact = expr(s"percentile(o_totalprice, $q)")
          when(abs(approx - exact) / exact <= 0.02, 1).otherwise(0).as(name)
        }
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            ok(0.5, "p50_ok"), ok(0.9, "p90_ok"), ok(0.99, "p99_ok"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(1 AS INTEGER) AS p50_ok,
               CAST(1 AS INTEGER) AS p90_ok,
               CAST(1 AS INTEGER) AS p99_ok
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // ----------------------------------------------------------------
    // Intra-document repetition (the Gopher-style quality filter):
    // duplicate-3-gram fraction and most-frequent-3-gram share per doc.
    // The Spark side is entirely NARROW — grams, sort, and the
    // longest-equal-run fold happen inside the row, no explode, no
    // shuffle (the 100 TB shape for a per-doc filter); the oracle
    // restates the same statistics relationally.
    Q(
      "t15_repetition",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("r", TextAnalysis.ngramRepetition(col("text"), 3))
          .filter(col("r.n_grams") > 0)
          .select(col("doc_id"),
            col("r.n_grams").as("n_grams"),
            col("r.n_distinct").as("n_distinct"),
            round(lit(1.0) - col("r.n_distinct") / col("r.n_grams").cast("double"), 6)
              .as("dup_frac"),
            round(col("r.top_n") / col("r.n_grams").cast("double"), 6)
              .as("top_frac"))
          .orderBy("doc_id"),
      Some("""
        WITH g AS (
          SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
          FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
               UNNEST(range(1, len(t) - 1)) AS u(i)),
        c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY 1, 2),
        s AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_grams,
                     COUNT(*) AS n_distinct, MAX(n) AS top_n
              FROM c GROUP BY 1)
        SELECT doc_id, n_grams, n_distinct,
               round(1.0 - n_distinct / CAST(n_grams AS DOUBLE), 6) AS dup_frac,
               round(top_n / CAST(n_grams AS DOUBLE), 6) AS top_frac
        FROM s
        ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Benchmark-contamination sweep: t6's deterministic 80/20 split,
    // then every held-out doc audited for word-3-gram overlap with the
    // train corpus — overlapping train docs, largest single-doc
    // overlap, and covered-shingle share (zeros when clean). Candidate
    // generation is the equi-join on the shingle; nothing pairwise.
    Q(
      "c1_contamination",
      (s, d) => {
        val split = Tables.documents(s, d)
          .withColumn("bucket", expr(
            """(position(substr(md5(CAST(doc_id AS STRING)), 1, 1)
                 IN '0123456789abcdef') - 1) * 16
             + (position(substr(md5(CAST(doc_id AS STRING)), 2, 1)
                 IN '0123456789abcdef') - 1)"""))
        Contamination.report(
          split.filter(col("bucket") % 100 < 80),
          split.filter(col("bucket") % 100 >= 80),
          "doc_id", "text", k = 3)
          .orderBy("test_id")
      },
      Some("""
        WITH sp AS (
          SELECT doc_id, text,
                 ((strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
                   % 100 < 80 AS is_train
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id, is_train,
                 t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
          FROM (SELECT doc_id, is_train, string_split(text, ' ') AS t FROM sp),
               UNNEST(range(1, len(t) - 1)) AS u(i)),
        tr AS (SELECT doc_id AS train_id, shingle FROM sh WHERE is_train),
        te AS (SELECT doc_id AS test_id, shingle FROM sh WHERE NOT is_train),
        pairs AS (
          SELECT test_id, train_id, COUNT(*) AS n_common
          FROM te JOIN tr USING (shingle) GROUP BY 1, 2),
        pt AS (SELECT test_id, COUNT(*) AS n_train_docs,
                      MAX(n_common) AS max_common
               FROM pairs GROUP BY 1),
        sz AS (SELECT test_id, COUNT(*) AS n_shingles FROM te GROUP BY 1),
        fnd AS (SELECT test_id, COUNT(*) AS n_found
                FROM (SELECT DISTINCT te.test_id, te.shingle
                      FROM te JOIN tr ON te.shingle = tr.shingle)
                GROUP BY 1)
        SELECT sz.test_id,
               COALESCE(pt.n_train_docs, 0) AS n_train_docs,
               COALESCE(pt.max_common, 0) AS max_common,
               sz.n_shingles,
               COALESCE(fnd.n_found, 0) AS n_found,
               round(COALESCE(fnd.n_found, 0)
                 / CAST(sz.n_shingles AS DOUBLE), 6) AS contaminated_frac
        FROM sz
        LEFT JOIN pt ON sz.test_id = pt.test_id
        LEFT JOIN fnd ON sz.test_id = fnd.test_id
        ORDER BY sz.test_id""")),

    // ----------------------------------------------------------------
    // PII scrub (the pre-training redaction pass): deterministic PII
    // injected into every 7th doc, then per-kind match counts and the
    // fully-redacted text (as md5 — the gate needn't carry megabytes).
    // RE2-compatible patterns mean DuckDB reproduces the identical
    // redaction byte-for-byte; map-side only, no shuffle.
    Q(
      "t16_pii_scrub",
      (s, d) => {
        val injected = when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" reach jane.doe+x@mail-example.org" +
            " or https://ex.io/p?q=1 or 555-123-4567")))
          .otherwise(col("text"))
        Tables.documents(s, d)
          .withColumn("text", injected)
          .withColumn("c", TextAnalysis.piiCounts(col("text")))
          .select(col("doc_id"),
            col("c.n_email").as("n_email"),
            col("c.n_url").as("n_url"),
            col("c.n_phone").as("n_phone"),
            md5(TextAnalysis.scrubPii(col("text"))).as("scrubbed_md5"))
          .orderBy("doc_id")
      },
      Some {
        val Seq(email, url, phone) = TextAnalysis.piiPatterns.map(_._2)
        s"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0
                      THEN text || ' reach jane.doe+x@mail-example.org' ||
                           ' or https://ex.io/p?q=1 or 555-123-4567'
                      ELSE text END AS text
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(text, '$url')) AS BIGINT) AS n_url,
               CAST(len(regexp_extract_all(text, '$phone')) AS BIGINT) AS n_phone,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '$email', '<EMAIL>', 'g'),
                 '$url', '<URL>', 'g'),
                 '$phone', '<PHONE>', 'g')) AS scrubbed_md5
        FROM t
        ORDER BY doc_id"""
      }),

    // ----------------------------------------------------------------
    // Weighted corpus mixing (the data-mixing step before training):
    // downsample each language to a target weight with a DETERMINISTIC
    // per-doc uniform — 16 bits of md5('mix|'||doc_id) — compared to an
    // integer threshold (weight × 65536), so the sample is reproducible
    // on any cluster, any partitioning, any engine. No rand(), no
    // state; map-side only. en is halved, the rest rebalanced.
    Q(
      "t19_weighted_mix",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("mix_bucket", expr(
            (1 to 4).map(j =>
              s"""(position(substr(md5('mix|' || CAST(doc_id AS STRING)), $j, 1)
                    IN '0123456789abcdef') - 1) * ${1 << (4 * (4 - j))}""")
              .mkString(" + ")))
          .withColumn("threshold",
            when(col("lang") === "en", 32768)      // 0.50
              .when(col("lang") === "de", 65536)   // 1.00
              .when(col("lang") === "es", 52428)   // 0.80
              .when(col("lang") === "fr", 58982)   // 0.90
              .otherwise(39321))                   // zh 0.60
          .filter(col("mix_bucket") < col("threshold"))
          .select("doc_id", "lang", "mix_bucket")
          .orderBy("doc_id"),
      Some("""
        WITH u AS (
          SELECT doc_id, lang,
                 (strpos('0123456789abcdef',
                    substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
               + (strpos('0123456789abcdef',
                    substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
               + (strpos('0123456789abcdef',
                    substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                    substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
                   AS mix_bucket
          FROM documents)
        SELECT doc_id, lang, mix_bucket
        FROM u
        WHERE mix_bucket < CASE lang WHEN 'en' THEN 32768 WHEN 'de' THEN 65536
                             WHEN 'es' THEN 52428 WHEN 'fr' THEN 58982
                             ELSE 39321 END
        ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Token-BUDGET corpus mix (t19's successor): t19 samples at fixed
    // per-class rates; real pretraining mixes are specified as "B total
    // tokens, source s gets share w_s" — and a source can run OUT of
    // tokens, in which case its shortfall is re-allocated to sources
    // that still have headroom (single-pass waterfilling). All
    // allocation math happens on the 20-row per-source frame (two tiny
    // broadcast joins; the corpus itself is touched exactly once, by
    // the final map-side threshold filter); every accumulation is
    // decimal (order-independent) and every intermediate double is
    // rounded to 6 dp, so the derived per-source rates — and therefore
    // the md5-threshold sample — are bit-identical in both engines.
    Q(
      "t22_token_budget",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val dec = DecimalType(28, 6)
        val toks = Tables.documents(s, d)
          .withColumn("n_tokens",
            size(split(trim(col("text")), "\\s+")).cast("long"))
          .withColumn("wgt",
            regexp_extract(col("source"), "(\\d+)", 1).cast("int") % 4 + 1)
        val per = toks.groupBy("source", "wgt")
          .agg(sum(col("n_tokens")).as("avail"))
        val tot = per.agg(sum(col("avail")).as("tok_total"),
          sum(col("wgt")).as("wgt_total"))
        val alloc = per.join(broadcast(tot))
          .withColumn("want",
            lit(0.8) * col("tok_total").cast("double") * col("wgt") /
              col("wgt_total"))
          .withColumn("alloc1",
            round(least(col("want"), col("avail").cast("double")), 6))
          .withColumn("headroom",
            round(col("avail").cast("double") - col("alloc1"), 6))
        val sums = alloc.agg(
          sum(col("alloc1").cast(dec)).cast("double").as("A1"),
          sum(col("headroom").cast(dec)).cast("double").as("H"))
        val rates = alloc.join(broadcast(sums))
          .withColumn("leftover",
            lit(0.8) * col("tok_total").cast("double") - col("A1"))
          .withColumn("alloc2", round(col("alloc1") +
            when(col("H") > 0,
              least(col("headroom"),
                col("leftover") * col("headroom") / col("H")))
              .otherwise(lit(0.0)), 6))
          .withColumn("threshold",
            floor(least(lit(1.0), col("alloc2") / col("avail").cast("double"))
              * 65536).cast("int"))
          .select("source", "threshold")
        toks.join(broadcast(rates), "source")
          .withColumn("tok_bucket", expr(
            (1 to 4).map(j =>
              s"""(position(substr(md5('tok|' || CAST(doc_id AS STRING)), $j, 1)
                    IN '0123456789abcdef') - 1) * ${1 << (4 * (4 - j))}""")
              .mkString(" + ")))
          .filter(col("tok_bucket") < col("threshold"))
          .select("doc_id", "source", "n_tokens")
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source,
                 len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                 CAST(regexp_extract(source, '(\d+)', 1) AS INTEGER) % 4 + 1 AS wgt
          FROM documents),
        per AS (
          SELECT source, wgt, SUM(n_tokens) AS avail FROM toks GROUP BY 1, 2),
        tot AS (SELECT SUM(avail) AS tok_total, SUM(wgt) AS wgt_total FROM per),
        alloc AS (
          SELECT source, avail,
                 round(least(0.8 * CAST(tok_total AS DOUBLE) * wgt / wgt_total,
                             CAST(avail AS DOUBLE)), 6) AS alloc1,
                 round(CAST(avail AS DOUBLE) -
                   round(least(0.8 * CAST(tok_total AS DOUBLE) * wgt / wgt_total,
                               CAST(avail AS DOUBLE)), 6), 6) AS headroom,
                 tok_total
          FROM per CROSS JOIN tot),
        sums AS (
          SELECT CAST(SUM(CAST(alloc1 AS DECIMAL(28,6))) AS DOUBLE) AS A1,
                 CAST(SUM(CAST(headroom AS DECIMAL(28,6))) AS DOUBLE) AS H
          FROM alloc),
        rates AS (
          SELECT source,
                 CAST(floor(least(1.0,
                   round(alloc1 + CASE WHEN H > 0 THEN
                       least(headroom,
                         (0.8 * CAST(tok_total AS DOUBLE) - A1) * headroom / H)
                     ELSE 0.0 END, 6)
                   / CAST(avail AS DOUBLE)) * 65536) AS INTEGER) AS threshold
          FROM alloc CROSS JOIN sums),
        bucketed AS (
          SELECT t.doc_id, t.source, t.n_tokens, r.threshold,
                 (strpos('0123456789abcdef',
                    substr(md5('tok|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
               + (strpos('0123456789abcdef',
                    substr(md5('tok|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
               + (strpos('0123456789abcdef',
                    substr(md5('tok|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                    substr(md5('tok|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
                   AS tok_bucket
          FROM toks t JOIN rates r USING (source))
        SELECT doc_id, source, n_tokens
        FROM bucketed
        WHERE tok_bucket < threshold
        ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // TEMPERATURE-scaled corpus mix (the multilingual-sampling α of
    // mBERT/XLM-R, at α = 0.5): sampling weight ∝ share^α flattens the
    // source distribution — big sources are down-weighted, small ones
    // boosted — without the hard per-class rates of t19 or the budget
    // waterfilling of t22. α = 0.5 is computed as sqrt, which IEEE
    // requires correctly rounded (pow does not!), so both engines
    // derive bit-identical weights; all accumulation is decimal and
    // every intermediate rounds to 6 dp, t22's determinism recipe.
    Q(
      "t25_temperature_mix",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val dec = DecimalType(28, 6)
        val toks = Tables.documents(s, d)
          .withColumn("n_tokens",
            size(split(trim(col("text")), "\\s+")).cast("long"))
        val per = toks.groupBy("source").agg(sum(col("n_tokens")).as("avail"))
        val tot = per.agg(sum(col("avail")).as("tok_total"))
        val weighted = per.join(broadcast(tot))
          .withColumn("wgt",
            round(sqrt(col("avail").cast("double") /
              col("tok_total").cast("double")), 6))
        val wsum = weighted.agg(
          sum(col("wgt").cast(dec)).cast("double").as("wgt_total"))
        // budget: half the corpus tokens, allocated ∝ share^0.5
        val rates = weighted.join(broadcast(wsum))
          .withColumn("alloc", round(lit(0.5) *
            col("tok_total").cast("double") * col("wgt") / col("wgt_total"), 6))
          .withColumn("threshold",
            floor(least(lit(1.0), col("alloc") / col("avail").cast("double"))
              * 65536).cast("int"))
          .select("source", "threshold")
        toks.join(broadcast(rates), "source")
          .withColumn("mix_bucket", expr(
            (1 to 4).map(j =>
              s"""(position(substr(md5('temp|' || CAST(doc_id AS STRING)), $j, 1)
                    IN '0123456789abcdef') - 1) * ${1 << (4 * (4 - j))}""")
              .mkString(" + ")))
          .filter(col("mix_bucket") < col("threshold"))
          .select("doc_id", "source", "n_tokens")
          .orderBy("doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source,
                 len(string_split_regex(trim(text), '\s+')) AS n_tokens
          FROM documents),
        per AS (SELECT source, SUM(n_tokens) AS avail FROM toks GROUP BY 1),
        tot AS (SELECT SUM(avail) AS tok_total FROM per),
        weighted AS (
          SELECT source, avail, tok_total,
                 round(sqrt(CAST(avail AS DOUBLE) /
                            CAST(tok_total AS DOUBLE)), 6) AS wgt
          FROM per CROSS JOIN tot),
        ws AS (
          SELECT CAST(SUM(CAST(wgt AS DECIMAL(28,6))) AS DOUBLE) AS wgt_total
          FROM weighted),
        rates AS (
          SELECT source,
                 CAST(floor(least(1.0,
                   round(0.5 * CAST(tok_total AS DOUBLE) * wgt / wgt_total, 6)
                     / CAST(avail AS DOUBLE)) * 65536) AS INTEGER) AS threshold
          FROM weighted CROSS JOIN ws),
        bucketed AS (
          SELECT t.doc_id, t.source, t.n_tokens, r.threshold,
                 (strpos('0123456789abcdef',
                    substr(md5('temp|' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
               + (strpos('0123456789abcdef',
                    substr(md5('temp|' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
               + (strpos('0123456789abcdef',
                    substr(md5('temp|' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                    substr(md5('temp|' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
                   AS mix_bucket
          FROM toks t JOIN rates r USING (source))
        SELECT doc_id, source, n_tokens
        FROM bucketed
        WHERE mix_bucket < threshold
        ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Inverted index: posting lists for the useful middle of the term-
    // frequency spectrum (the df band — relative to corpus size so it
    // holds at any sf — drops both hapax noise and stop-word hot keys,
    // the same skew guard as c1's shingle cap). One explode + one
    // hash-agg; postings ship CSV'd for the gate.
    Q(
      "t17_inverted_index",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.count() // bounded driver scalar, like s8's max-date
        InvertedIndex.build(docs, "doc_id", "text",
          minDf = (n * 0.05).toLong, maxDf = (n * 0.78).toLong)
          .select(col("term"), col("df"),
            concat_ws(",", col("postings")).as("postings"))
          .orderBy("term")
      },
      Some("""
        WITH tok AS (
          SELECT DISTINCT doc_id, t AS term
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents)),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        p AS (
          SELECT term, COUNT(*) AS df,
                 array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
          FROM tok GROUP BY 1)
        SELECT term, df, postings FROM p, n
        WHERE df BETWEEN CAST(floor(0.05 * n_docs) AS BIGINT)
                     AND CAST(floor(0.78 * n_docs) AS BIGINT)
        ORDER BY term""")),

    // ----------------------------------------------------------------
    // Conjunctive search: documents containing ALL query terms, no
    // index materialization — isin filter at the scan, one
    // count-matched-terms aggregate.
    Q(
      "t18_search_and",
      (s, d) =>
        InvertedIndex.searchAll(Tables.documents(s, d), "doc_id", "text",
          Seq("spark", "window", "merge"))
          .orderBy("doc_id"),
      Some("""
        WITH tok AS (
          SELECT DISTINCT doc_id, t AS term
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents))
        SELECT doc_id FROM tok
        WHERE term IN ('spark', 'window', 'merge')
        GROUP BY doc_id
        HAVING COUNT(*) = 3
        ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // RANKED retrieval: BM25 top-10 (Robertson/Spärck Jones) — the
    // scored form completing t18's boolean AND. No corpus self-join:
    // tf is an isin-filtered hash-agg (shuffle bounded by matching
    // pairs), df broadcasts back (≤|terms| rows), N/avgdl ride one
    // broadcast 1-row aggregate, and the top-k is TakeOrdered — the
    // rank window runs over k rows only, after the limit. Per-term
    // components round to 6 dp before an exact DECIMAL sum, so both
    // engines rank identical scores (ties broken by doc_id).
    Q(
      "t28_bm25_topk",
      (s, d) =>
        InvertedIndex.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          Seq("spark", "window", "merge", "vector"), k = 10)
          .orderBy("rank"),
      Some("""
        WITH tk AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tk),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl
               FROM dl),
        tf AS (
          SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest(t) AS w FROM tk)
          WHERE w IN ('spark', 'window', 'merge', 'vector')
          GROUP BY doc_id, w),
        df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
               FROM tf GROUP BY term),
        comp AS (
          SELECT tf.doc_id,
                 round(ln(CAST(1.0 AS DOUBLE)
                          + (st.n_docs - df.df + CAST(0.5 AS DOUBLE))
                            / (df.df + CAST(0.5 AS DOUBLE)))
                   * (tf.tf * CAST(2.2 AS DOUBLE))
                   / (tf.tf + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE)
                          + CAST(0.75 AS DOUBLE) * dl.dl / st.avgdl)),
                   6) AS c
          FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        sc AS (
          SELECT doc_id,
                 CAST(sum(CAST(c AS DECIMAL(28, 6))) AS DOUBLE) AS score
          FROM comp GROUP BY doc_id),
        ranked AS (
          SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
                 doc_id, score
          FROM sc)
        SELECT rank, doc_id, score FROM ranked
        WHERE rank <= 10 ORDER BY rank""")),

    // ----------------------------------------------------------------
    // Blocked fuzzy join (j11): entity resolution by edit distance. The
    // all-pairs Levenshtein join is O(n²·len²) — a non-starter at any
    // scale — so candidates are BLOCKED on a shared prefix first (an
    // equi-join), and the edit-distance predicate runs only inside
    // blocks. Production entity resolution unions several blocking
    // passes (prefix, phonetic, length band) the same way; the oracle
    // mirrors this single pass exactly.
    Q(
      "j11_fuzzy_block_join",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"),
            substring(col("c_name"), 1, 16).as("blk"))
        // candidate generation by single-deletion neighborhoods
        // (operators.EditJoin): entity keys share long constant
        // prefixes, so the within-block self-join degenerates to one
        // giant block scanned O(n²·len) in a single task; the del-1 key
        // join emits the same verified pairs from O(n·len) keys. The
        // exact bounded levenshtein below re-verifies every candidate,
        // so the kept rows — and their dist — are identical.
        graft.operators.EditJoin.candidatesLev1(c, "blk", "c_custkey", "c_name")
          // bounded form (SPARK-44125): walks only the ±1 diagonal band
          // with a length-difference early exit — O(threshold·len) per
          // pair instead of O(len²); returns the exact distance within
          // the bound and -1 above it, so `between(0, 1)` keeps exactly
          // the rows `levenshtein(a,b) <= 1` kept, with identical dist
          .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 1))
          .filter(col("dist").between(0, 1))
          .select("id_a", "id_b", "dist")
          .orderBy("id_a", "id_b")
      },
      Some("""
        WITH c AS (
          SELECT c_custkey, c_name, substr(c_name, 1, 16) AS blk
          FROM customer)
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               levenshtein(a.c_name, b.c_name) AS dist
        FROM c a JOIN c b ON a.blk = b.blk AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        ORDER BY id_a, id_b""")),

    // ----------------------------------------------------------------
    // Per-group z-score outliers (a16): flag events whose value sits
    // more than 3 sample standard deviations from its event-type mean —
    // the numeric-column scrub a training pipeline runs before feature
    // normalization. Group stats ride exact decimal moments
    // (order-independent, bit-exact vs the oracle) and broadcast back
    // onto the event scan: the 100 TB side is one pass, no second
    // shuffle.
    Q(
      "a16_outlier_zscore",
      (s, d) => {
        import graft.functions.Deterministic.{davg, dstddev}
        val ev = Tables.events(s, d)
          .select("event_id", "event_type", "value")
        val st = ev.groupBy("event_type")
          .agg(davg(col("value")).as("mean"), dstddev(col("value")).as("std"))
        // std's decimal moment crosses 2^53 internal units, where the
        // int128→double cast can differ from DuckDB's by an ulp (the a3
        // precedent) — round z and apply the threshold to the ROUNDED
        // value on both engines so the flagged set is identical
        val z = round((col("value") - col("mean")) / col("std"), 6)
        ev.join(broadcast(st), "event_type")
          .withColumn("z", z)
          .filter(abs(col("z")) > 3)
          .select("event_id", "event_type", "value", "z")
          .orderBy("event_id")
      },
      Some("""
        WITH st AS (
          SELECT event_type,
                 CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(value) AS mean,
                 sqrt((CAST(SUM(CAST(value AS DECIMAL(18,6))
                                * CAST(value AS DECIMAL(19,6))) AS DOUBLE)
                        - CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                          * CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                          / CAST(COUNT(value) AS DOUBLE))
                      / (CAST(COUNT(value) AS DOUBLE) - 1.0)) AS std
          FROM events GROUP BY 1)
        SELECT event_id, e.event_type, value,
               round((value - mean) / std, 6) AS z
        FROM events e JOIN st ON e.event_type = st.event_type
        WHERE abs(round((value - mean) / std, 6)) > 3
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // Equi-width histogram (h2): 20-bin distribution audit of a numeric
    // column between its global min/max — the pre-training sanity plot
    // (spotting truncation, spikes, unit errors) as a query. The
    // min/max frame is one row, broadcast under the binning scan; bin
    // edges are the identical double expression on both engines so bin
    // assignment is bit-deterministic.
    Q(
      "h2_value_hist",
      (s, d) => {
        val ev = Tables.events(s, d).select("value")
        val mm = ev.agg(min("value").as("mn"), max("value").as("mx"))
        ev.crossJoin(broadcast(mm))
          .withColumn("bin",
            least(lit(19L),
              floor((col("value") - col("mn")) / ((col("mx") - col("mn")) / 20))))
          .groupBy("bin").agg(count(lit(1)).as("n_rows"))
          .orderBy("bin")
      },
      Some("""
        WITH mm AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
        SELECT least(19, CAST(floor((value - mn) / ((mx - mn) / 20)) AS BIGINT)) AS bin,
               COUNT(*) AS n_rows
        FROM events CROSS JOIN mm
        GROUP BY 1 ORDER BY 1""")),

    // ----------------------------------------------------------------
    // Equi-depth histogram (h3): 10 equal-count buckets over
    // events.value with per-bucket boundaries — the quantile audit that
    // drives curriculum binning and balanced batch construction. EXACT
    // ntile semantics without the single-partition sort window (the
    // last unbounded one in a query path — the w1 caveat): the global
    // rank comes from Rank.globalRank (range-partition + in-partition
    // rank + per-partition offsets, no reducer sees more than its
    // slice), and the bucket is ntile's closed form over (rank, N) —
    // the first N mod 10 buckets hold ceil(N/10) rows, the rest
    // floor(N/10). Identical buckets, identical hash, scale-safe.
    Q(
      "h3_equidepth_hist",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_id"), col("value"))
        val (ranked, n) = graft.operators.Rank.globalRankN(
          ev, Seq("value", "event_id"), "rank")
        val q = n / 10; val r = n % 10
        ranked
          .withColumn("bucket", expr(
            s"""CAST(CASE WHEN rank <= $r * ($q + 1)
                THEN (rank - 1) div ($q + 1) + 1
                ELSE $r + (rank - 1 - $r * ($q + 1)) div $q + 1 END AS INT)"""))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_rows"),
            min("value").as("lo"), max("value").as("hi"))
          .orderBy("bucket")
      },
      Some("""
        WITH b AS (
          SELECT value,
                 CAST(ntile(10) OVER (ORDER BY value, event_id) AS INTEGER)
                   AS bucket
          FROM events)
        SELECT bucket, COUNT(*) AS n_rows, MIN(value) AS lo, MAX(value) AS hi
        FROM b GROUP BY 1 ORDER BY 1""")),

    // ----------------------------------------------------------------
    // Pareto frontier (a17): the skyline of parts maximizing p_size
    // while minimizing p_retailprice — the quality-vs-cost selection
    // curve a curation pipeline draws before picking a tradeoff point.
    // Naive skyline is an O(n²) dominance anti-join; here it collapses
    // to one map-side-combine aggregation per size (a model-sized
    // frame: |distinct sizes|), a strict-prefix running min over that
    // tiny frame, and a broadcast join back onto the single big-table
    // pass. A row survives iff it is the cheapest at its size AND
    // strictly cheaper than every larger size's cheapest.
    Q(
      "a17_pareto_frontier",
      (s, d) => {
        val p = Tables.part(s, d)
          .select("p_partkey", "p_size", "p_retailprice")
        val perSize = p.groupBy("p_size")
          .agg(min("p_retailprice").as("size_min"))
        val w = Window.orderBy(col("p_size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val pref = perSize.withColumn("larger_min", min("size_min").over(w))
        p.join(broadcast(pref), "p_size")
          .filter(col("p_retailprice") === col("size_min") &&
            (col("larger_min").isNull ||
              col("p_retailprice") < col("larger_min")))
          .select("p_partkey", "p_size", "p_retailprice")
          .orderBy("p_partkey")
      },
      Some("""
        WITH ps AS (
          SELECT p_size, MIN(p_retailprice) AS size_min
          FROM part GROUP BY 1),
        pref AS (
          SELECT p_size, size_min,
                 MIN(size_min) OVER (ORDER BY p_size DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS larger_min
          FROM ps)
        SELECT p_partkey, p.p_size, p_retailprice
        FROM part p JOIN pref ON p.p_size = pref.p_size
        WHERE p_retailprice = size_min
          AND (larger_min IS NULL OR p_retailprice < larger_min)
        ORDER BY p_partkey""")),

    // ----------------------------------------------------------------
    // Sorted-neighborhood dedup candidates (d17): the third classic
    // entity-resolution blocking family alongside hash blocking (j11)
    // and LSH (d4) — sort records on a key, compare each record only to
    // its w=2 successors in sort order: O(n·w) comparisons instead of
    // O(Σ block²). Distributed form: partition by a sort-key prefix,
    // sort within, `lead` windows — no global sort; the documented cost
    // is pairs straddling a prefix boundary (production SNM re-runs
    // with a second, shifted key, same shape).
    Q(
      "d17_snm_pairs",
      (s, d) => {
        val w = Window.partitionBy("blk").orderBy("c_name", "c_custkey")
        val nb = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"),
            substring(col("c_name"), 1, 15).as("blk"))
          .withColumn("nid1", lead("c_custkey", 1).over(w))
          .withColumn("nname1", lead("c_name", 1).over(w))
          .withColumn("nid2", lead("c_custkey", 2).over(w))
          .withColumn("nname2", lead("c_name", 2).over(w))
        nb.select(col("c_custkey").as("id"), col("c_name").as("name"),
            explode(array(
              struct(col("nid1").as("nid"), col("nname1").as("nname")),
              struct(col("nid2").as("nid"), col("nname2").as("nname"))))
              .as("nbr"))
          .filter(col("nbr.nid").isNotNull)
          // bounded levenshtein: exact within the bound, -1 above (j11)
          .withColumn("dist", levenshtein(col("name"), col("nbr.nname"), 2))
          .filter(col("dist").between(0, 2))
          .select(least(col("id"), col("nbr.nid")).as("id_a"),
            greatest(col("id"), col("nbr.nid")).as("id_b"), col("dist"))
          .orderBy("id_a", "id_b")
      },
      Some("""
        WITH c AS (
          SELECT c_custkey, c_name, substr(c_name, 1, 15) AS blk
          FROM customer),
        nb AS (
          SELECT c_custkey AS id, c_name AS name,
                 lead(c_custkey, 1) OVER w AS nid1,
                 lead(c_name, 1) OVER w AS nname1,
                 lead(c_custkey, 2) OVER w AS nid2,
                 lead(c_name, 2) OVER w AS nname2
          FROM c
          WINDOW w AS (PARTITION BY blk ORDER BY c_name, c_custkey)),
        cand AS (
          SELECT id, name, nid1 AS nid, nname1 AS nname FROM nb
          WHERE nid1 IS NOT NULL
          UNION ALL
          SELECT id, name, nid2, nname2 FROM nb
          WHERE nid2 IS NOT NULL)
        SELECT LEAST(id, nid) AS id_a, GREATEST(id, nid) AS id_b,
               levenshtein(name, nname) AS dist
        FROM cand
        WHERE levenshtein(name, nname) <= 2
        ORDER BY id_a, id_b""")),

    // ----------------------------------------------------------------
    // Entity-resolution capstone (er1): evidence from TWO independent
    // blocking families — prefix blocks (j11's) and sorted-neighborhood
    // windows (d17's) — unioned into one edge set and resolved to
    // entities by connected components ([[Graph.connectedComponents]] — the
    // log-N min-propagation loop). Production ER is exactly this union
    // of cheap blockers + one components pass; no single blocker's
    // recall is trusted alone. The oracle replays both pair sets and a
    // recursive-CTE walk — algorithm-independent, so it gates the
    // composition, not the loop's internals.
    Q(
      "er1_entity_resolution",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
        // family 1: prefix-16 blocks, lev <= 1 (j11) — candidates via
        // single-deletion neighborhoods (EditJoin; see j11): same
        // verified pair set as the within-block self-join without its
        // degenerate one-giant-block O(n²) scan
        val blocked = c.withColumn("blk", substring(col("c_name"), 1, 16))
        val pairsPrefix = graft.operators.EditJoin
          .candidatesLev1(blocked, "blk", "c_custkey", "c_name")
          // bounded levenshtein: banded O(threshold·len) per pair (j11)
          .filter(levenshtein(col("name_a"), col("name_b"), 1).between(0, 1))
          .select("id_a", "id_b")
        // family 2: SNM prefix-15 sort, w = 2 successors, lev <= 2 (d17)
        val w = Window.partitionBy("blk").orderBy("c_name", "c_custkey")
        val nb = c.withColumn("blk", substring(col("c_name"), 1, 15))
          .withColumn("nid1", lead("c_custkey", 1).over(w))
          .withColumn("nname1", lead("c_name", 1).over(w))
          .withColumn("nid2", lead("c_custkey", 2).over(w))
          .withColumn("nname2", lead("c_name", 2).over(w))
        val pairsSnm = nb.select(col("c_custkey").as("id"), col("c_name").as("name"),
            explode(array(
              struct(col("nid1").as("nid"), col("nname1").as("nname")),
              struct(col("nid2").as("nid"), col("nname2").as("nname")))).as("nbr"))
          .filter(col("nbr.nid").isNotNull &&
            levenshtein(col("name"), col("nbr.nname"), 2).between(0, 2))
          .select(least(col("id"), col("nbr.nid")).as("id_a"),
            greatest(col("id"), col("nbr.nid")).as("id_b"))
        val pairs = pairsPrefix.unionByName(pairsSnm).distinct()
        graft.operators.Graph
          .connectedComponents(c.select("c_custkey"), "c_custkey", pairs)
          .withColumnRenamed("cluster_rep", "entity_rep")
          .orderBy("c_custkey")
      },
      Some("""
        WITH RECURSIVE cc AS (
          SELECT c_custkey, c_name, substr(c_name, 1, 16) AS blk16,
                 substr(c_name, 1, 15) AS blk15
          FROM customer),
        pa AS (
          SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
          FROM cc a JOIN cc b ON a.blk16 = b.blk16 AND a.c_custkey < b.c_custkey
          WHERE levenshtein(a.c_name, b.c_name) <= 1),
        nb AS (
          SELECT c_custkey AS id, c_name AS name,
                 lead(c_custkey, 1) OVER w AS nid1,
                 lead(c_name, 1) OVER w AS nname1,
                 lead(c_custkey, 2) OVER w AS nid2,
                 lead(c_name, 2) OVER w AS nname2
          FROM cc
          WINDOW w AS (PARTITION BY blk15 ORDER BY c_name, c_custkey)),
        pb AS (
          SELECT LEAST(id, nid) AS id_a, GREATEST(id, nid) AS id_b
          FROM (
            SELECT id, name, nid1 AS nid, nname1 AS nname FROM nb
            WHERE nid1 IS NOT NULL
            UNION ALL
            SELECT id, name, nid2, nname2 FROM nb WHERE nid2 IS NOT NULL)
          WHERE levenshtein(name, nname) <= 2),
        e0 AS (SELECT id_a, id_b FROM pa UNION SELECT id_a, id_b FROM pb),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM e0
          UNION ALL
          SELECT id_b AS src, id_a AS dst FROM e0),
        walk AS (
          SELECT c_custkey AS id, c_custkey AS label FROM customer
          UNION
          SELECT e.src AS id, w.label FROM edges e JOIN walk w ON w.id = e.dst)
        SELECT id AS c_custkey, MIN(label) AS entity_rep
        FROM walk GROUP BY id
        ORDER BY c_custkey""")),

    // ----------------------------------------------------------------
    // Positional phrase search (t33): exact-phrase retrieval through a
    // POSITIONAL posting list — t17/t18 index terms; phrases need
    // (doc, position) postings and an adjacency join (pos₂ = pos₁ + 1),
    // the classic IR next-word join. Both posting sides are term-
    // filtered BEFORE the join (isin pushdown to the scan), so the join
    // input is phrase-candidate-sized, never the corpus.
    Q(
      "t33_phrase_search",
      (s, d) => {
        val Seq(w1, w2) = Seq("table", "hash")
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
          .filter(col("w").isin(w1, w2))
        val p1 = tok.filter(col("w") === w1).select(col("doc_id"), col("pos"))
        val p2 = tok.filter(col("w") === w2)
          .select(col("doc_id"), (col("pos") - 1).as("pos"))
        p1.join(p2, Seq("doc_id", "pos"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"), min("pos").as("first_pos"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tk AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        tok AS (
          SELECT doc_id, u.i - 1 AS pos, t[u.i] AS w
          FROM tk, UNNEST(range(1, len(t) + 1)) AS u(i)
          WHERE t[u.i] IN ('table', 'hash')),
        p1 AS (SELECT doc_id, pos FROM tok WHERE w = 'table'),
        p2 AS (SELECT doc_id, pos - 1 AS pos FROM tok WHERE w = 'hash')
        SELECT doc_id, COUNT(*) AS n_hits,
               CAST(MIN(pos) AS INTEGER) AS first_pos
        FROM p1 JOIN p2 USING (doc_id, pos)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Per-document n-gram NOVELTY (t34): the curation metric between
    // exact dedup and near-dup pairs — what fraction of a doc's
    // 3-token shingles appears for the FIRST time in corpus order
    // (min doc_id per shingle). Boilerplate-heavy late docs score low
    // without any pairwise comparison: two map-side-combining
    // hash-aggs, no joins over pairs, unrounded exact-integer division
    // (the t30 discipline).
    Q(
      "t34_ngram_novelty",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val sh = tok
          .withColumn("w2", lead("w", 1).over(
            Window.partitionBy("doc_id").orderBy("pos")))
          .withColumn("w3", lead("w", 2).over(
            Window.partitionBy("doc_id").orderBy("pos")))
          .filter(col("w3").isNotNull)
          .select(col("doc_id"),
            concat_ws(" ", col("w"), col("w2"), col("w3")).as("shingle"))
          .distinct()
        val firsts = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
        sh.join(firsts, "shingle")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
          .withColumn("novelty",
            col("n_novel").cast("double") / col("n_shingles"))
          .orderBy("doc_id")
      },
      Some("""
        WITH tk AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 t[u.i] || ' ' || t[u.i + 1] || ' ' || t[u.i + 2] AS shingle
          FROM tk, UNNEST(range(1, len(t) - 1)) AS u(i)),
        firsts AS (
          SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(CASE WHEN first_doc = doc_id THEN 1 END) AS BIGINT)
                 AS n_novel,
               CAST(COUNT(CASE WHEN first_doc = doc_id THEN 1 END) AS DOUBLE)
                 / COUNT(*) AS novelty
        FROM sh JOIN firsts USING (shingle)
        GROUP BY doc_id ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Deterministic epoch shuffle (t29): the training-order primitive —
    // each epoch is a pseudorandom permutation of the corpus given by
    // sorting on md5(epoch || doc_id), reproducible on any engine and
    // any partitioning (no RNG state, no seed files). The query emits
    // the first 100 positions of epoch 7: the sort-prefix compiles to
    // TakeOrderedAndProject (per-partition heaps + driver merge of
    // k-row results — no global sort materializes), and only the 100
    // survivors see the rank window. At 100 TB the full permutation is
    // never materialized either: a range-partitioned write on the same
    // key streams epoch order straight to the trainer.
    Q(
      "t29_epoch_shuffle",
      (s, d) => {
        val keyed = Tables.documents(s, d).select(col("doc_id"),
          md5(concat(lit("epoch7|"), col("doc_id").cast("string")))
            .as("shuffle_key"))
        keyed.orderBy("shuffle_key", "doc_id").limit(100)
          .withColumn("rank",
            row_number().over(Window.orderBy("shuffle_key", "doc_id")))
          .select("rank", "doc_id", "shuffle_key")
      },
      Some("""
        WITH keyed AS (
          SELECT doc_id,
                 md5('epoch7|' || CAST(doc_id AS VARCHAR)) AS shuffle_key
          FROM documents),
        top AS (
          SELECT * FROM keyed ORDER BY shuffle_key, doc_id LIMIT 100)
        SELECT CAST(row_number() OVER (ORDER BY shuffle_key, doc_id)
                 AS INTEGER) AS rank,
               doc_id, shuffle_key
        FROM top ORDER BY rank""")),

    // ----------------------------------------------------------------
    // Hashed linear-model inference (t30): the fastText-style quality
    // scorer as a pure query — each token hashes to a 16-bit feature id
    // whose weight is derived from the hash itself, so "model inference"
    // is a narrow map + one map-side-combining hash-agg: no weight
    // table, no shuffle of the corpus, no UDF. All arithmetic is
    // integer-exact until the single per-doc division (bit-identical on
    // both engines). At 100 TB this is the shape of every cheap-model
    // scoring pass: broadcast(weights) ⨯ narrow tokenize ⨯ hash-agg.
    Q(
      "t30_linear_quality",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val wInt = (conv(substring(md5(col("w")), 1, 4), 16, 10)
          .cast("long") % 2001 - 1000)
        // the quotient's operands are exact small integers on both
        // engines, so the UNROUNDED division is bit-identical — a
        // round() here would *create* engine divergence at decimal
        // half-points (319/80000 = .0039875 exactly); the label reads
        // the integer sign, never the float
        tok.select(col("doc_id"), wInt.as("wi"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum("wi").as("w_sum"))
          .withColumn("score",
            col("w_sum").cast("double") / (lit(1000.0) * col("n_tokens")))
          .withColumn("label", when(col("w_sum") > 0, "keep").otherwise("drop"))
          .select("doc_id", "n_tokens", "w_sum", "score", "label")
          .orderBy("doc_id")
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        hx AS (
          SELECT doc_id,
                 (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 4096
               + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) * 256
               + (strpos('0123456789abcdef', substr(md5(w), 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(w), 4, 1)) - 1) AS v
          FROM tok),
        per AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                 CAST(SUM(v % 2001 - 1000) AS BIGINT) AS w_sum
          FROM hx GROUP BY doc_id)
        SELECT doc_id, n_tokens, w_sum,
               CAST(w_sum AS DOUBLE) / (CAST(1000.0 AS DOUBLE) * n_tokens) AS score,
               CASE WHEN w_sum > 0 THEN 'keep' ELSE 'drop' END AS label
        FROM per ORDER BY doc_id""")),

    // ----------------------------------------------------------------
    // Deterministic augmentation (t31): 10% token dropout keyed on
    // md5(doc|pos) — reproducible on any cluster, no rand(). The
    // rebuilt text is order-restored via array_sort over (pos, token)
    // structs (collect_list alone is partition-order-dependent) and
    // gated by md5 — byte-exact reconstruction, the same discipline as
    // the d15 rewrite. Narrow explode + one hash-agg; the corpus never
    // joins anything.
    Q(
      "t31_token_dropout",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val keep = conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("|"), col("pos").cast("string"))), 1, 4), 16, 10)
          .cast("long") % 10 =!= 0
        tok.withColumn("kept", keep)
          .groupBy("doc_id")
          .agg(
            count(when(col("kept"), 1)).as("n_kept"),
            count(when(!col("kept"), 1)).as("n_dropped"),
            md5(concat_ws(" ", transform(
              array_sort(collect_list(when(col("kept"),
                struct(col("pos"), col("w"))))),
              x => x.getField("w")))).as("md5_raw"))
          // a doc whose every token dropped: DuckDB's string_agg over
          // all-NULL is NULL, Spark's concat_ws over empty is "" — align
          // on NULL for the degenerate case
          .withColumn("text_md5",
            when(col("n_kept") > 0, col("md5_raw")))
          .select("doc_id", "n_kept", "n_dropped", "text_md5")
          .orderBy("doc_id")
      },
      Some("""
        WITH tk AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        tok AS (
          SELECT doc_id, u.i - 1 AS pos, t[u.i] AS w
          FROM tk, UNNEST(range(1, len(t) + 1)) AS u(i)),
        flagged AS (
          SELECT doc_id, pos, w,
                 ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
                + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
                + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 10 <> 0
                  AS kept
          FROM (SELECT *, md5(CAST(doc_id AS VARCHAR) || '|'
                  || CAST(pos AS VARCHAR)) AS h FROM tok))
        SELECT doc_id,
               COUNT(CASE WHEN kept THEN 1 END) AS n_kept,
               COUNT(CASE WHEN NOT kept THEN 1 END) AS n_dropped,
               md5(string_agg(CASE WHEN kept THEN w END, ' ' ORDER BY pos))
                 AS text_md5
        FROM flagged GROUP BY doc_id
        ORDER BY doc_id"""))
  )
}
