package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed MERGE/upsert as a pure DataFrame operator — Delta Lake's
  * `MERGE INTO` re-expressed on Parquet-era storage (SURVEY.md §2.2
  * K2/K3; reference MERGE sites: `notebooks/github_data_ingestion.py:
  * 349-383`, `bronze_to_silver_transformation.py:867-920`,
  * `personal_repos_ingestion.py:417-433`).
  *
  * Semantics implemented:
  *   - matched rows        -> UPDATE SET (per-column resolution; default
  *                            takes the source value);
  *   - source-only rows    -> INSERT * ;
  *   - target-only rows    -> kept unchanged;
  *   - `insertOnly = true` -> WHEN NOT MATCHED INSERT only (idempotent
  *                            append: matched rows keep the target row —
  *                            the reference's late/duplicate-data guard).
  *
  * Execution shape: ONE full-outer shuffle join on the key columns.
  * At 100 TB both sides hash-partition on the key; if the target is
  * bucketed/pre-partitioned by the key the shuffle halves, and AQE
  * handles skewed keys. No row ever moves to the driver.
  *
  * Column resolution (`smartCases`) covers the reference's "smart merge"
  * (K3): e.g. keep an existing good classification but always refresh
  * metric columns — pass a (targetCol, sourceCol) => Column resolver per
  * column (`bronze_to_silver_transformation.py:899-914`).
  *
  * Schema evolution (`evolveSchema = true`) covers the reference's Delta
  * `overwriteSchema=true` + `MERGE ... INSERT *` tolerance of drifting
  * schemas (`bronze_to_silver_transformation.py:915-941`; SURVEY §1.3):
  *   - source columns absent from the target are APPENDED to the output
  *     schema (null for rows the source never touched);
  *   - target columns absent from the source PASS THROUGH unchanged
  *     (null for newly inserted rows).
  * With `evolveSchema = false` (default) any column-set difference fails
  * loudly — silent column drops are how pipelines corrupt tables.
  */
object Upsert {

  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      smartCases: Map[String, (Column, Column) => Column] = Map.empty,
      insertOnly: Boolean = false,
      evolveSchema: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    require(keys.forall(target.columns.contains) && keys.forall(source.columns.contains),
      s"both sides must carry the key columns ${keys.mkString(",")}")
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    // a resolver only ever fires for columns present on BOTH sides; a
    // key on an evolved-in/away or misspelled column would be silently
    // ignored — fail loudly instead
    val resolvable = dataCols.filter(source.columns.contains).toSet
    require(smartCases.keySet.subsetOf(resolvable),
      s"smartCases must be keyed on shared non-key columns; not resolvable: " +
        s"${(smartCases.keySet -- resolvable).mkString(",")}")
    val dropped = dataCols.filterNot(source.columns.contains)
    val added = source.columns.filterNot(keys.contains)
      .filterNot(target.columns.contains).toSeq
    if (!evolveSchema) require(dropped.isEmpty && added.isEmpty,
      s"source must be schema-aligned with target " +
        s"(missing: ${dropped.mkString(",")}; extra: ${added.mkString(",")}); " +
        "pass evolveSchema = true for Delta MERGE schema-evolution semantics")

    val t = target.withColumn("__t", lit(1)).alias("t")
    val s = source.withColumn("__s", lit(1)).alias("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, cond, "full_outer")

    val matched = col("t.__t").isNotNull && col("s.__s").isNotNull
    val sourceOnly = col("t.__t").isNull

    val keyCols = keys.map(k => coalesce(col(s"t.$k"), col(s"s.$k")).as(k))
    val valueCols = dataCols.map { c =>
      val tc = col(s"t.$c")
      if (!source.columns.contains(c)) tc.as(c) // evolved away: pass through
      else {
        val sc = col(s"s.$c")
        val onMatch =
          if (insertOnly) tc
          else smartCases.get(c).map(f => f(tc, sc)).getOrElse(sc)
        when(matched, onMatch).when(sourceOnly, sc).otherwise(tc).as(c)
      }
    }
    // Evolved-in columns: source value wherever the source touched the row
    // (insert-only merges keep the target row on match, so matched rows
    // stay null — the target never had the column); null elsewhere.
    val newCols = added.map { c =>
      val sc = col(s"s.$c")
      (if (insertOnly) when(sourceOnly, sc) else when(col("s.__s").isNotNull, sc)).as(c)
    }
    joined.select(keyCols ++ valueCols ++ newCols: _*)
  }

  /** K3 resolver: keep the target value unless it is NULL or one of the
    * `placeholder` values (e.g. "Other"/"unknown") — the reference's
    * preserve-good-classification rule. */
  def keepUnlessPlaceholder(placeholders: String*): (Column, Column) => Column =
    (tc, sc) => when(tc.isNull.or(tc.isin(placeholders: _*)), sc).otherwise(tc)

  /** Incremental-rollup resolver: running aggregate + new partial
    * (counts, exact decimal sums). With it, `merge` maintains an
    * aggregate table without recomputing history — the don't-rescan-
    * the-cube pattern that matters at 100 TB. Keep sums in DECIMAL
    * through the merge and cast to double only at the end, so the
    * incrementally-maintained value is bit-identical to a full
    * recompute. */
  def additive: (Column, Column) => Column = (tc, sc) => tc + sc

  /** A11 merge reconciliation (the reference's new-vs-updated report,
    * `github_data_ingestion.py:386-393`): one aggregation over the same
    * outer join instead of the reference's separate before/after
    * `count()` jobs. */
  /** Change data feed for a MERGE (Delta CDF parity): per-row change
    * records — `insert` for source-only keys, `update_preimage` +
    * `update_postimage` for matched keys whose data columns differ.
    * Unchanged rows emit nothing; target-only rows emit nothing by
    * default (the NET-diff contract k15 gates) or a `delete` image with
    * `emitDeletes = true` (the per-commit `table_changes` contract —
    * a row that left the table between two versions IS a change a
    * downstream replica must replay). ONE full-outer shuffle join,
    * then a narrow 0–2-row explode per key; both sides must share the
    * schema (CDF is a same-shape protocol).
    */
  def changeFeed(target: DataFrame, source: DataFrame, keys: Seq[String],
      emitDeletes: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "changeFeed requires at least one key column")
    require(target.columns.sorted.sameElements(source.columns.sorted),
      "changeFeed requires identical schemas on both sides")
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    // presence markers, not key-null checks: the join is null-safe
    // (<=>), so a NULL key can legitimately MATCH — a null-based
    // "matched" test would misclassify that row as an insert
    val t = target.select(target.columns.map(c => col(c).as(s"__t_$c")).toSeq
      :+ lit(1).as("__t_present"): _*)
    val s = source.select(source.columns.map(c => col(c).as(s"__s_$c")).toSeq
      :+ lit(1).as("__s_present"): _*)
    val cond = keys.map(k => col(s"__t_$k") <=> col(s"__s_$k")).reduce(_ && _)
    def img(tag: String, side: String) = struct(
      (lit(tag).as("_change_type") +:
        dataCols.map(c => col(s"__${side}_$c").as(c))): _*)
    val diff = dataCols.map(c => !(col(s"__t_$c") <=> col(s"__s_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val matched = col("__t_present").isNotNull && col("__s_present").isNotNull
    val upserts = when(col("__t_present").isNull, array(img("insert", "s")))
      .when(matched && diff,
        array(img("update_preimage", "t"), img("update_postimage", "s")))
    val chain =
      if (emitDeletes)
        upserts.when(col("__s_present").isNull, array(img("delete", "t")))
      else upserts
    t.join(s, cond, "full_outer")
      .select(
        (keys.map(k => coalesce(col(s"__t_$k"), col(s"__s_$k")).as(k)) :+
          explode(
            // slice(...,1,0): a typed EMPTY array — unchanged (and,
            // without emitDeletes, target-only) keys emit no change rows
            chain.otherwise(slice(array(img("insert", "s")), 1, 0))).as("__c")): _*)
      .select((keys.map(col) :+ col("__c._change_type") ) ++
        dataCols.map(c => col(s"__c.$c")): _*)
  }

  /** Apply a change feed to a replica: the inverse of [[changeFeed]].
    * `insert` / `update_postimage` rows become the key's new row,
    * `delete` rows remove it, `update_preimage` rows are audit-only.
    * A feed spanning several commits (it carries `_commit_version`) is
    * first reduced to each key's TERMINAL image — change application
    * is idempotent and order-insensitive per key, which is what lets a
    * downstream replica replay an arbitrary feed window in one shot.
    *
    * Execution shape: one keyed window (terminal-image reduction), one
    * null-safe left-anti join on the keys, one union — all partitioned
    * by the same keys, so the feed (O(delta)) never forces a second
    * shuffle of the target beyond the anti-join. */
  def applyFeed(target: DataFrame, feed: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "applyFeed requires at least one key column")
    require(feed.columns.contains("_change_type"),
      "feed must carry _change_type (a changeFeed/tableChanges frame)")
    val terminal =
      if (feed.columns.contains("_commit_version")) {
        import org.apache.spark.sql.expressions.Window
        val prec = when(col("_change_type") === "update_preimage", 0).otherwise(1)
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col("_commit_version").desc, prec.desc)
        feed.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn", "_commit_version")
          .filter(col("_change_type") =!= "update_preimage")
      } else feed.filter(col("_change_type") =!= "update_preimage")
    val expect = target.columns.filterNot(keys.contains).toSet
    val got = terminal.columns.filterNot(keys.contains)
      .filterNot(_ == "_change_type").toSet
    require(expect == got,
      s"feed data columns must match the target's (missing: " +
        s"${(expect -- got).mkString(",")}; extra: ${(got -- expect).mkString(",")})")
    val upserts = terminal.filter(col("_change_type") =!= "delete")
      .drop("_change_type")
    val changed = terminal.select(keys.map(col): _*).distinct().alias("c")
    val t = target.alias("t")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"c.$k")).reduce(_ && _)
    t.join(changed, cond, "left_anti").unionByName(upserts)
  }

  def mergeStats(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val t = target.select(keys.map(col): _*).withColumn("__t", lit(1)).alias("t")
    val s = source.select(keys.map(col): _*).withColumn("__s", lit(1)).alias("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    t.join(s, cond, "full_outer").agg(
      count(when(col("t.__t").isNotNull && col("s.__s").isNotNull, 1))
        .as("updated"),
      count(when(col("t.__t").isNull, 1)).as("inserted"),
      count(when(col("s.__s").isNull, 1)).as("unchanged"))
  }
}
