package graft.queries

import graft.Tables
import graft.operators.{SqlMerge, Upsert}
import org.apache.spark.sql.functions._

/** MERGE/upsert semantics pack — the reference's Delta `MERGE INTO`
  * surface (SURVEY.md §2.2 K2/K3/K4) exercised through
  * [[graft.operators.Upsert]] on testdata-derived target/source slices,
  * with full-outer-join SQL oracles that restate MERGE semantics
  * declaratively.
  */
object MergeQueries {

  val all: Seq[Q] = Seq(
    // ----------------------------------------------------------------
    // K2: classic keyed upsert — UPDATE matched from source, INSERT new,
    // keep unmatched target (github_data_ingestion.py:349-383).
    Q(
      "k2_upsert",
      (s, d) => {
        val o = Tables.orders(s, d)
        val target = o.filter(col("o_orderkey") % 4 =!= 0)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val source = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
            (col("o_totalprice") * 1.1).as("o_totalprice"))
        Upsert.merge(target, source, Seq("o_orderkey"))
          .orderBy("o_orderkey")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 4 != 0),
        s AS (
          SELECT o_orderkey, 'U' AS o_orderstatus,
                 o_totalprice * 1.1 AS o_totalprice
          FROM orders WHERE o_orderkey % 2 = 0)
        SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE WHEN s.o_orderkey IS NOT NULL
                    THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
               CASE WHEN s.o_orderkey IS NOT NULL
                    THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice
        FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
        ORDER BY o_orderkey""")),

    // ----------------------------------------------------------------
    // K3: "smart merge" — preserve good classifications (keep target
    // category unless NULL/'Other'), always refresh metrics
    // (bronze_to_silver_transformation.py:899-914).
    Q(
      "k3_smart_merge",
      (s, d) => {
        val o = Tables.orders(s, d)
        val target = o.filter(col("o_orderkey") % 4 =!= 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 3 === 0, "Other")
              .otherwise(col("o_orderpriority")).as("category"),
            col("o_totalprice").as("metric"))
        val source = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), lit("2-HIGH").as("category"),
            (col("o_totalprice") + 5.0).as("metric"))
        Upsert.merge(target, source, Seq("o_orderkey"),
          smartCases = Map("category" -> Upsert.keepUnlessPlaceholder("Other")))
          .orderBy("o_orderkey")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN 'Other'
                      ELSE o_orderpriority END AS category,
                 o_totalprice AS metric
          FROM orders WHERE o_orderkey % 4 != 0),
        s AS (
          SELECT o_orderkey, '2-HIGH' AS category,
                 o_totalprice + 5.0 AS metric
          FROM orders WHERE o_orderkey % 2 = 0)
        SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE
                 WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
                   THEN CASE WHEN t.category IS NULL OR t.category = 'Other'
                             THEN s.category ELSE t.category END
                 WHEN t.o_orderkey IS NULL THEN s.category
                 ELSE t.category END AS category,
               CASE WHEN s.o_orderkey IS NOT NULL
                    THEN s.metric ELSE t.metric END AS metric
        FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
        ORDER BY o_orderkey""")),

    // ----------------------------------------------------------------
    // K4: insert-only merge on a composite key — idempotent append, the
    // late/duplicate-data guard (personal_repos_ingestion.py:417-433).
    Q(
      "k4_insert_only",
      (s, d) => {
        val ev = Tables.events(s, d)
        val target = ev.filter(col("event_id") % 3 === 0)
          .select("event_id", "event_type", "value")
        val source = ev.filter(col("event_id") % 2 === 0)
          .select(col("event_id"), col("event_type"),
            (col("value") + 100.0).as("value"))
        Upsert.merge(target, source, Seq("event_id", "event_type"),
          insertOnly = true)
          .orderBy("event_id")
      },
      Some("""
        WITH t AS (
          SELECT event_id, event_type, value
          FROM events WHERE event_id % 3 = 0),
        s AS (
          SELECT event_id, event_type, value + 100.0 AS value
          FROM events WHERE event_id % 2 = 0)
        SELECT event_id, event_type, value FROM t
        UNION ALL
        SELECT event_id, event_type, value FROM s
        WHERE NOT EXISTS (SELECT 1 FROM t
          WHERE t.event_id = s.event_id AND t.event_type = s.event_type)
        ORDER BY event_id""")),

    // ----------------------------------------------------------------
    // A11: merge reconciliation counts (new vs updated vs untouched —
    // github_data_ingestion.py:386-393) as ONE aggregation over the
    // outer join, replacing the reference's repeated count() jobs.
    Q(
      "k5_merge_stats",
      (s, d) => {
        val o = Tables.orders(s, d)
        Upsert.mergeStats(
          o.filter(col("o_orderkey") % 4 =!= 0),
          o.filter(col("o_orderkey") % 2 === 0),
          Seq("o_orderkey"))
      },
      Some("""
        WITH t AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 4 != 0),
        s AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0)
        SELECT COUNT(CASE WHEN t.o_orderkey IS NOT NULL
                          AND s.o_orderkey IS NOT NULL THEN 1 END) AS updated,
               COUNT(CASE WHEN t.o_orderkey IS NULL THEN 1 END) AS inserted,
               COUNT(CASE WHEN s.o_orderkey IS NULL THEN 1 END) AS unchanged
        FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey""")),

    // ----------------------------------------------------------------
    // Incremental rollup maintenance: an aggregate table (history before
    // the cutoff) MERGEd with the new slice's partial aggregates via
    // additive resolution — history is never rescanned. Sums stay in
    // DECIMAL through the merge (exact, associative) and cast to double
    // only at the end, so the oracle can simply be the FULL recompute:
    // incremental maintenance must be indistinguishable from it.
    Q(
      "k6_incremental_rollup",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("l_returnflag", "l_linestatus")
            .agg(count(lit(1)).as("n_rows"),
              sum(col("l_quantity")
                .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
                .as("sum_qty_dec"))
        val history = partial(li.filter(col("l_shipdate") < "1997-01-01"))
        val newDay = partial(li.filter(col("l_shipdate") >= "1997-01-01"))
        Upsert.merge(history, newDay, Seq("l_returnflag", "l_linestatus"),
          smartCases = Map("n_rows" -> Upsert.additive,
            "sum_qty_dec" -> Upsert.additive))
          .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
            col("sum_qty_dec").cast("double").as("sum_qty"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ----------------------------------------------------------------
    // K4's literal API shape: k3's smart merge expressed as the MERGE
    // statement TEXT a reference notebook would run
    // (bronze_to_silver_transformation.py:867-920), staged through temp
    // views and executed by operators.SqlMerge — regex skeleton parse,
    // Catalyst-parsed assignment expressions, one full-outer shuffle
    // join. The oracle is k3's: the SQL surface must be
    // indistinguishable from the programmatic operator.
    Q(
      "k7_sql_merge",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.filter(col("o_orderkey") % 4 =!= 0)
          .select(col("o_orderkey"),
            when(col("o_orderkey") % 3 === 0, "Other")
              .otherwise(col("o_orderpriority")).as("category"),
            col("o_totalprice").as("metric"))
          .createOrReplaceTempView("graft_k7_target")
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), lit("2-HIGH").as("category"),
            (col("o_totalprice") + 5.0).as("metric"))
          .createOrReplaceTempView("graft_k7_source")
        SqlMerge.run(s, """
          MERGE INTO graft_k7_target AS target
          USING graft_k7_source AS source
          ON target.o_orderkey = source.o_orderkey
          WHEN MATCHED THEN
            UPDATE SET
              metric = source.metric,
              -- keep a good classification, refresh the metric
              category = CASE
                  WHEN target.category = 'Other' OR target.category IS NULL
                  THEN source.category
                  ELSE target.category
              END
          WHEN NOT MATCHED THEN
            INSERT *""")
          .orderBy("o_orderkey")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN 'Other'
                      ELSE o_orderpriority END AS category,
                 o_totalprice AS metric
          FROM orders WHERE o_orderkey % 4 != 0),
        s AS (
          SELECT o_orderkey, '2-HIGH' AS category,
                 o_totalprice + 5.0 AS metric
          FROM orders WHERE o_orderkey % 2 = 0)
        SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE
                 WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
                   THEN CASE WHEN t.category IS NULL OR t.category = 'Other'
                             THEN s.category ELSE t.category END
                 WHEN t.o_orderkey IS NULL THEN s.category
                 ELSE t.category END AS category,
               CASE WHEN s.o_orderkey IS NOT NULL
                    THEN s.metric ELSE t.metric END AS metric
        FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
        ORDER BY o_orderkey""")),

    // ----------------------------------------------------------------
    // Schema evolution: the source drops a target column (o_orderstatus)
    // and brings a new one (o_orderpriority) — Delta `overwriteSchema=true` +
    // `MERGE ... INSERT *` drift tolerance
    // (bronze_to_silver_transformation.py:915-941; SURVEY §1.3).
    // Evolved-away columns pass through (null for inserted rows);
    // evolved-in columns carry the source value wherever the source
    // touched the row and null for target-only rows.
    Q(
      "k8_schema_evolution",
      (s, d) => {
        val o = Tables.orders(s, d)
        val target = o.filter(col("o_orderkey") % 4 =!= 0)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val source = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") * 1.1).as("o_totalprice"),
            col("o_orderpriority"))
        Upsert.merge(target, source, Seq("o_orderkey"), evolveSchema = true)
          .orderBy("o_orderkey")
      },
      Some("""
        WITH t AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey % 4 != 0),
        s AS (
          SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice,
                 o_orderpriority
          FROM orders WHERE o_orderkey % 2 = 0)
        SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
               t.o_orderstatus AS o_orderstatus,
               CASE WHEN s.o_orderkey IS NOT NULL
                    THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
               s.o_orderpriority AS o_orderpriority
        FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
        ORDER BY o_orderkey"""))
  )
}
