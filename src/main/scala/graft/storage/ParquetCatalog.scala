package graft.storage

import graft.operators.Upsert
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Partitioned-Parquet table catalog — the storage module of SURVEY.md
  * §7.1: named tables as partitioned directories, the reference's Delta
  * lakehouse surface (K1 partitioned overwrite
  * `bronze_to_silver_transformation.py:935-941`, S6/S7 catalog scans,
  * S8 latest-partition reads) without a Delta jar.
  *
  * Write paths:
  *   - `overwrite`           — full-table K1 semantics, atomic via
  *                             write-temp-then-swap (a reader never sees
  *                             a half-written table);
  *   - `overwritePartitions` — dynamic partition overwrite (only the
  *                             partitions present in the frame are
  *                             replaced — the per-run partition rewrite);
  *   - `upsert`              — read + [[Upsert.merge]] + atomic rewrite:
  *                             MERGE without Delta.
  *
  * At 100 TB: partition columns (e.g. `partition_date`) make every
  * downstream equality filter a partition-pruned scan; the swap is a
  * metadata move, not a data copy. Tables are written zstd-compressed
  * by default — ~2× the ratio of Spark's snappy default at comparable
  * scan speed, which at 100 TB is the difference in storage and scan
  * I/O; override `codec` for hot tables where decode CPU dominates.
  */
final class ParquetCatalog(spark: SparkSession, root: String,
    codec: String = "zstd") {

  private def tableDir(name: String): Path = Paths.get(root, name)

  def exists(name: String): Boolean = Files.exists(tableDir(name))

  def read(name: String): DataFrame =
    spark.read.parquet(tableDir(name).toString)

  // ---- skipping-index lifecycle -------------------------------------
  //
  // Once a table is indexed (`index`), every catalog mutation keeps the
  // stats fresh automatically: appends/upserts/deletes run an
  // INCREMENTAL refresh (footer reads only for files the index has not
  // seen), and a full overwrite re-collects over the new files. The
  // index stays advisory — scans reconcile against the live file
  // listing and re-apply predicates — so a missed refresh can only cost
  // speed, never rows.

  /** Build (or rebuild) the file-level min/max skipping index for
    * `cols` — one distributed parquet-FOOTER pass, no data pages. */
  def index(name: String, cols: Seq[String]): Unit = {
    require(exists(name), s"no table $name")
    SkippingIndex.write(spark, tableDir(name).toString, cols)
    ()
  }

  /** Columns the table's index covers (empty when unindexed). */
  private def indexCols(name: String): Seq[String] = {
    val dir = tableDir(name).toString
    if (exists(name) && SkippingIndex.exists(dir))
      SkippingIndex.read(dir).flatMap(_.cols.map(_.column)).distinct.sorted
    else Nil
  }

  /** Incrementally reconcile the index with the table's current files
    * (no-op for unindexed tables). */
  private def refreshIndex(name: String): Unit = {
    val dir = tableDir(name).toString
    if (SkippingIndex.exists(dir)) { SkippingIndex.refresh(spark, dir); () }
  }

  /** Index-accelerated range read: conjunctive `(column, lo, hi)`
    * predicates open only the files whose [min,max] intersects (plus
    * any not-yet-indexed files, conservatively) — the Delta/Iceberg
    * stats-pruned scan. Unindexed tables fall back to a plain scan with
    * the same predicates applied, so callers never branch. */
  def readRange(name: String, preds: Seq[(String, Double, Double)]): DataFrame = {
    val dir = tableDir(name).toString
    if (SkippingIndex.exists(dir)) SkippingIndex.scanAll(spark, dir, preds)
    else preds.foldLeft(read(name)) { case (df, (c, lo, hi)) =>
      df.filter(col(c) >= lo && col(c) <= hi)
    }
  }

  /** Atomic full overwrite: write to a temp dir, swap directories. An
    * existing skipping index is re-collected over the new files (its
    * column set survives the swap). */
  def overwrite(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val priorIndex = indexCols(name) // the swap discards the old stats file
    val tmp = Paths.get(root, s".tmp-$name-${System.nanoTime()}")
    val w = df.write.mode(SaveMode.Overwrite).option("compression", codec)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    val dest = tableDir(name)
    val old = Paths.get(root, s".old-$name-${System.nanoTime()}")
    if (Files.exists(dest)) Files.move(dest, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) deleteRecursively(old)
    if (priorIndex.nonEmpty) index(name, priorIndex)
  }

  /** Dynamic partition overwrite: replace only the partitions present in
    * `df`, leave the rest of the table untouched. */
  def overwritePartitions(name: String, df: DataFrame, partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "overwritePartitions needs partition columns")
    if (!exists(name)) overwrite(name, df, partitionBy)
    else {
      df.write
        .mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", codec)
        .partitionBy(partitionBy: _*)
        .parquet(tableDir(name).toString)
      refreshIndex(name)
    }
  }

  /** Append (the insert-only path when keys are known unique). An
    * existing index is refreshed incrementally — footer reads ONLY for
    * the appended files. */
  def append(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append).option("compression", codec)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tableDir(name).toString)
    refreshIndex(name)
  }

  /** MERGE INTO this table (K2/K3): read current state, resolve with
    * [[Upsert.merge]], rewrite. First write degenerates to the source
    * frame. `evolveSchema = true` is the storage add-column path — the
    * atomic rewrite persists the widened schema (Delta
    * `overwriteSchema=true` parity, reference
    * `bronze_to_silver_transformation.py:939`).
    *
    * **Partition-scoped rewrite** (the 100 TB write path): with
    * `partitionBy` set and no schema evolution, only the partitions the
    * delta actually touches are merged and rewritten — Delta MERGE's
    * file-level rewrite (`bronze_to_silver_transformation.py:867-920`)
    * at partition granularity. Touched = the delta's own partitions ∪
    * the partitions holding matched target keys (the second set needs a
    * target scan only when a partition column is NOT part of the merge
    * key; when it is, a matched key's partition is by definition in the
    * delta). The target read is statically partition-pruned to the
    * touched set; untouched partitions' files are never opened OR
    * rewritten. An update that moves a row's partition value empties
    * its old slot correctly (the old partition is in the touched set
    * and is rewritten without the row; a fully-emptied partition dir is
    * removed). Schema evolution still forces the full rewrite — a
    * partial rewrite would leave the table with per-partition schema
    * drift. */
  def upsert(name: String, source: DataFrame, keys: Seq[String],
      smartCases: Map[String, (Column, Column) => Column] = Map.empty,
      insertOnly: Boolean = false,
      partitionBy: Seq[String] = Nil,
      evolveSchema: Boolean = false): Unit = {
    if (!exists(name)) overwrite(name, source, partitionBy)
    else if (partitionBy.isEmpty || evolveSchema) {
      val merged =
        Upsert.merge(read(name), source, keys, smartCases, insertOnly, evolveSchema)
          .persist() // materialize before the swap deletes the input files
      merged.count()
      overwrite(name, merged, partitionBy)
      merged.unpersist()
    } else {
      val target = read(name)
      // ONE unioned expression so Spark coerces both sides' partition
      // column types (e.g. a source STRING vs an inferred DATE on the
      // hive-partitioned read-back) before values reach the driver —
      // mixed-type driver tuples would break the touched/written diff.
      // When every partition column is part of the merge key, a matched
      // target key's partition is by definition in the delta, so the
      // target match scan is skipped entirely.
      val srcParts = source.select(partitionBy.map(col): _*)
      val partsDf =
        if (partitionBy.forall(keys.contains)) srcParts
        else srcParts.unionByName(
          target.join(
              broadcast(source.select(keys.map(col): _*).distinct()),
              keys, "left_semi")
            .select(partitionBy.map(col): _*))
      val touched = collectPartitions(partsDf.distinct())
      if (touched.nonEmpty) {
        val slice = target.filter(partitionPredicate(partitionBy, touched))
        val merged =
          Upsert.merge(slice, source, keys, smartCases, insertOnly)
            .persist() // materialize before dynamic overwrite drops inputs
        merged.count()
        // partitions with surviving rows get rewritten by the dynamic
        // overwrite; touched partitions ABSENT from the merged frame
        // (every row moved out) must have their stale dirs removed —
        // dynamic overwrite only touches partitions it writes
        val written = collectPartitions(
          merged.select(partitionBy.map(col): _*).distinct())
        overwritePartitions(name, merged, partitionBy)
        dropPartitionDirs(name, partitionBy, touched.diff(written))
        refreshIndex(name) // reconcile entries for dropped dirs
        merged.unpersist()
      }
    }
  }

  /** Partition tuples of a small distinct frame, collected to the
    * driver — partition-count-sized, never data-sized. */
  private def collectPartitions(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(r.get))

  /** OR-of-ANDs equality predicate over partition columns with literal
    * values — statically partition-prunable by the parquet scan. */
  private[graft] def partitionPredicate(partitionBy: Seq[String],
      tuples: Seq[Seq[Any]]): Column =
    tuples.map { vs =>
      partitionBy.zip(vs).map { case (c, v) => col(c) <=> lit(v) }
        .reduce(_ && _)
    }.reduce(_ || _)

  /** Hive-style relative dir path for one partition tuple, with Spark's
    * own path escaping (null → `__HIVE_DEFAULT_PARTITION__`). */
  private def partitionRelPath(partitionBy: Seq[String], vs: Seq[Any]): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    partitionBy.zip(vs).map { case (c, v) =>
      val value =
        if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
        else ExternalCatalogUtils.escapePathName(v.toString)
      s"${ExternalCatalogUtils.escapePathName(c)}=$value"
    }.mkString("/")
  }

  /** Remove hive-style partition dirs that a rewrite left empty (all
    * their rows merged/deleted away) — dynamic overwrite only touches
    * partitions PRESENT in the written frame. */
  private def dropPartitionDirs(name: String, partitionBy: Seq[String],
      tuples: Seq[Seq[Any]]): Unit =
    tuples.foreach { vs =>
      val dir = tableDir(name).resolve(partitionRelPath(partitionBy, vs))
      if (Files.exists(dir)) deleteRecursively(dir)
    }

  /** S8 latest-partition slice: max over the partition column, then a
    * partition-pruned equality scan. */
  def latestPartition(name: String, partitionCol: String): DataFrame = {
    val t = read(name)
    val mx = t.select(max(col(partitionCol))).head().get(0)
    t.filter(col(partitionCol) === lit(mx))
  }

  /** Compaction: rewrite the table into ~`rowsPerFile`-row files. Every
    * incremental upsert/append leaves small files behind; at scale the
    * scan cost becomes file-open dominated (the classic small-file
    * problem). One repartition + atomic swap. Layout options:
    *
    *   - `clusterBy`: lexicographic range-cluster — tight min/max (and
    *     thus file/row-group skipping) for the FIRST column only;
    *   - `zorderBy`: Morton-interleaved multi-column cluster
    *     ([[graft.functions.ZOrder]]) — every file is a hypercube in
    *     bucket space, so predicates on ANY clustered column skip
    *     files (ZOrderSpec measures the difference). Normalization
    *     bounds come from one min/max aggregate — O(columns), not a
    *     global ranking window.
    */
  def compact(name: String, rowsPerFile: Long,
      partitionBy: Seq[String] = Nil, clusterBy: Seq[String] = Nil,
      zorderBy: Seq[String] = Nil, zorderBits: Int = 8): Unit = {
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "pick clusterBy OR zorderBy, not both")
    val df = read(name)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / rowsPerFile).toInt)
    val repart =
      if (zorderBy.nonEmpty) {
        // one aggregate row carries every column's lo/hi
        val aggs = zorderBy.flatMap(c =>
          Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val lohi = zorderBy.indices.map(i =>
          (rowDouble(row, 2 * i), rowDouble(row, 2 * i + 1)))
        val zkey = graft.functions.ZOrder.zorderKey(zorderBits,
          zorderBy.zip(lohi).map { case (c, (lo, hi)) =>
            graft.functions.ZOrder.bucketize(col(c), lo, hi, zorderBits)
          }: _*)
        df.withColumn("__zkey", zkey)
          .repartitionByRange(files, col("__zkey"))
          .sortWithinPartitions(col("__zkey"))
          .drop("__zkey")
      } else if (clusterBy.nonEmpty)
        df.repartitionByRange(files, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else df.repartition(files)
    // persist+count before the swap: the lazy plan must not read files
    // the overwrite is about to replace
    repart.persist().count()
    overwrite(name, repart, partitionBy)
    repart.unpersist()
  }

  private def rowDouble(r: org.apache.spark.sql.Row, i: Int): Double =
    r.get(i) match {
      case null => 0.0
      case n: Number => n.doubleValue()
      case other => other.toString.toDouble
    }

  /** Row-level DELETE (Delta `DELETE WHERE` parity on plain parquet).
    * Returns the number of rows removed.
    *
    * With `partitionBy` set, only the partitions that actually contain
    * matching rows are rewritten: one scan finds the touched partition
    * set (partition-count-sized collect), the anti-filtered survivors
    * of JUST those partitions go through dynamic partition overwrite,
    * and fully-emptied partition dirs are removed. At 100 TB a delete
    * whose predicate hits one day's partition rewrites one partition,
    * not the table. Without `partitionBy` it is the full read +
    * anti-filter + atomic rewrite. */
  def delete(name: String, condition: Column,
      partitionBy: Seq[String] = Nil): Long = {
    val t = read(name)
    val hit = coalesce(condition, lit(false))
    if (partitionBy.isEmpty) {
      val keep = t.filter(!hit).persist()
      val removed = t.count() - keep.count() // materializes before the swap
      overwrite(name, keep)
      keep.unpersist()
      removed
    } else {
      val touched = collectPartitions(
        t.filter(hit).select(partitionBy.map(col): _*).distinct())
      if (touched.isEmpty) 0L
      else {
        val slice = t.filter(partitionPredicate(partitionBy, touched)).persist()
        val keep = slice.filter(!hit).persist()
        val removed = slice.count() - keep.count()
        val written = collectPartitions(
          keep.select(partitionBy.map(col): _*).distinct())
        if (written.nonEmpty) overwritePartitions(name, keep, partitionBy)
        dropPartitionDirs(name, partitionBy, touched.diff(written))
        refreshIndex(name)
        keep.unpersist(); slice.unpersist()
        removed
      }
    }
  }

  // ---- versioned tables: time travel + retention --------------------
  //
  // Delta/Iceberg time-travel parity on plain parquet: data lives in
  // immutable `.versions/<name>/v<N>` dirs and the table path is an
  // atomically-repointed symlink to the current version. Every
  // unversioned entry point (read / upsert / compact / skipping stats)
  // keeps working — it just follows the link. Writes are write-once;
  // readers of any retained version are never invalidated by a new
  // overwrite (the swap creates, never mutates). `vacuum` is the
  // retention boundary, exactly as in Delta: history costs storage
  // until you say otherwise.

  private def versionsDir(name: String): Path =
    Paths.get(root, ".versions", name)

  /** Retained version numbers, oldest first. */
  def versions(name: String): Seq[Long] = {
    val vd = versionsDir(name)
    if (!Files.isDirectory(vd)) Seq.empty
    else {
      val s = Files.list(vd)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.matches("v\\d+")).map(_.drop(1).toLong).toSeq.sorted
      } finally s.close()
    }
  }

  /** Overwrite that RETAINS history: the new frame becomes version N+1
    * in an immutable dir and the table path repoints atomically. A
    * pre-existing unversioned table is migrated as the first retained
    * version. Returns the new version number. */
  def overwriteVersioned(name: String, df: DataFrame,
      partitionBy: Seq[String] = Nil): Long = {
    val vd = versionsDir(name)
    Files.createDirectories(vd)
    val dest = tableDir(name)
    var next = versions(name).lastOption.getOrElse(0L) + 1
    if (Files.exists(dest, java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
        !Files.isSymbolicLink(dest)) {
      Files.move(dest, vd.resolve(s"v$next"), StandardCopyOption.ATOMIC_MOVE)
      next += 1
    }
    val target = vd.resolve(s"v$next")
    val w = df.write.mode(SaveMode.Overwrite).option("compression", codec)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(target.toString)
    val tmpLink = Paths.get(root, s".lnk-$name-${System.nanoTime()}")
    Files.createSymbolicLink(tmpLink, target.toAbsolutePath)
    Files.move(tmpLink, dest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Time-travel read of a retained version. */
  def readVersion(name: String, version: Long): DataFrame = {
    val p = versionsDir(name).resolve(s"v$version")
    require(Files.isDirectory(p),
      s"version $version of $name not retained (have: ${versions(name).mkString(",")})")
    spark.read.parquet(p.toString)
  }

  /** Migrate an unversioned table in place (its dir becomes the first
    * retained version behind the symlink) and return the CURRENT
    * version's backing dir. */
  private def ensureVersioned(name: String): Path = {
    require(exists(name), s"no table $name")
    val vd = versionsDir(name)
    Files.createDirectories(vd)
    val dest = tableDir(name)
    if (!Files.isSymbolicLink(dest)) {
      val next = versions(name).lastOption.getOrElse(0L) + 1
      val target = vd.resolve(s"v$next")
      Files.move(dest, target, StandardCopyOption.ATOMIC_MOVE)
      repoint(name, target)
    }
    dest.toRealPath()
  }

  /** Atomically repoint the table symlink at a version dir. */
  private def repoint(name: String, target: Path): Unit = {
    val tmpLink = Paths.get(root, s".lnk-$name-${System.nanoTime()}")
    Files.createSymbolicLink(tmpLink, target.toAbsolutePath)
    Files.move(tmpLink, tableDir(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Hard-link every file of `src` into `dst`, skipping paths whose
    * src-relative path starts with one of `excludeRel`. Versions share
    * untouched files at zero copy cost — the filesystem analogue of a
    * Delta/Iceberg manifest referencing unchanged data files from the
    * previous snapshot; deleting a version only unlinks. */
  private def linkClone(src: Path, dst: Path, excludeRel: Set[String]): Unit = {
    Files.createDirectories(dst)
    val s = Files.walk(src)
    try s.iterator().asScala.filter(_ != src).foreach { p =>
      val rel = src.relativize(p).toString
      val excluded = excludeRel.exists(e => rel == e || rel.startsWith(e + "/"))
      if (!excluded) {
        val t = dst.resolve(rel)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.createLink(t, p)
      }
    } finally s.close()
  }

  /** MERGE that RETAINS history (Delta MERGE + time travel in one):
    * the merge lands as version N+1; version N stays readable. With
    * `partitionBy` the new version hard-links every UNTOUCHED
    * partition's files from the current version (zero data copied —
    * only the delta's touched partitions are written), exactly Delta's
    * file-level rewrite where a new snapshot's manifest re-references
    * unchanged files. Readers are never invalidated: the merged frame
    * is computed FROM the still-live old version and the table symlink
    * repoints only after the new version is fully written — so no
    * persist/materialize barrier is needed, unlike the in-place
    * [[upsert]]. Returns the new version number. */
  def upsertVersioned(name: String, source: DataFrame, keys: Seq[String],
      smartCases: Map[String, (Column, Column) => Column] = Map.empty,
      insertOnly: Boolean = false,
      partitionBy: Seq[String] = Nil,
      evolveSchema: Boolean = false): Long = {
    if (!exists(name)) return overwriteVersioned(name, source, partitionBy)
    if (partitionBy.isEmpty || evolveSchema) {
      // migrate BEFORE building the lazy merge plan: overwriteVersioned's
      // own migration would move the dir the plan's captured file listing
      // still points at
      ensureVersioned(name)
      val merged =
        Upsert.merge(read(name), source, keys, smartCases, insertOnly, evolveSchema)
      return overwriteVersioned(name, merged, partitionBy)
    }
    val current = ensureVersioned(name)
    val target = read(name)
    val srcParts = source.select(partitionBy.map(col): _*)
    val partsDf =
      if (partitionBy.forall(keys.contains)) srcParts
      else srcParts.unionByName(
        target.join(
            broadcast(source.select(keys.map(col): _*).distinct()),
            keys, "left_semi")
          .select(partitionBy.map(col): _*))
    val touched = collectPartitions(partsDf.distinct())
    val next = versions(name).last + 1
    val newDir = versionsDir(name).resolve(s"v$next")
    linkClone(current, newDir,
      touched.map(partitionRelPath(partitionBy, _)).toSet)
    if (touched.nonEmpty) {
      val slice = target.filter(partitionPredicate(partitionBy, touched))
      Upsert.merge(slice, source, keys, smartCases, insertOnly)
        .write.mode(SaveMode.Append).option("compression", codec)
        .partitionBy(partitionBy: _*).parquet(newDir.toString)
    }
    repoint(name, newDir)
    // the hard-linked stats file from the old version lists the OLD
    // version's absolute paths; re-collect for the new version's files
    refreshIndex(name)
    next
  }

  /** DELETE WHERE that retains history — versioned sibling of
    * [[delete]]; untouched partitions hard-link-shared as in
    * [[upsertVersioned]]. Returns (newVersion, rowsRemoved). */
  def deleteVersioned(name: String, condition: Column,
      partitionBy: Seq[String] = Nil): (Long, Long) = {
    val current = ensureVersioned(name) // before any lazy plan over read(name)
    val t = read(name)
    val hit = coalesce(condition, lit(false))
    if (partitionBy.isEmpty) {
      val keep = t.filter(!hit)
      val removed = t.count() - keep.count()
      (overwriteVersioned(name, keep), removed)
    } else {
      val touched = collectPartitions(
        t.filter(hit).select(partitionBy.map(col): _*).distinct())
      val next = versions(name).last + 1
      val newDir = versionsDir(name).resolve(s"v$next")
      linkClone(current, newDir,
        touched.map(partitionRelPath(partitionBy, _)).toSet)
      var removed = 0L
      if (touched.nonEmpty) {
        val slice = t.filter(partitionPredicate(partitionBy, touched))
        val keep = slice.filter(!hit)
        removed = slice.count() - keep.count()
        keep.write.mode(SaveMode.Append).option("compression", codec)
          .partitionBy(partitionBy: _*).parquet(newDir.toString)
      }
      repoint(name, newDir)
      refreshIndex(name)
      (next, removed)
    }
  }

  /** Retention: drop all but the newest `keep` versions (the current
    * pointer is always among those) and sweep stray `.tmp-`/`.old-`
    * debris a crashed writer may have left. Returns dirs removed. */
  def vacuum(name: String, keep: Int = 1): Int = {
    require(keep >= 1, "must keep at least the current version")
    var removed = 0
    val vs = versions(name)
    vs.dropRight(keep).foreach { v =>
      deleteRecursively(versionsDir(name).resolve(s"v$v")); removed += 1
    }
    val s = Files.list(Paths.get(root))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith(".tmp-") || n.startsWith(".old-") || n.startsWith(".lnk-")
        }
        .toList.foreach { p => deleteRecursively(p); removed += 1 }
    } finally s.close()
    removed
  }

  /** Number of data files currently backing the table (compaction
    * telemetry). */
  def fileCount(name: String): Long = {
    val s = Files.walk(tableDir(name))
    try s.filter(p =>
      p.toString.endsWith(".parquet") && Files.isRegularFile(p)).count()
    finally s.close()
  }

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    finally s.close()
  }
}
