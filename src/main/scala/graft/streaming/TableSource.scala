package graft.streaming

import graft.storage.ParquetCatalog
import org.apache.spark.sql.{DataFrame, GraftStreamFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Versioned catalog tables as Structured Streaming SOURCES, with
  * VERSION NUMBERS as offsets — Delta's streaming-source design on the
  * manifest tier. Two modes:
  *
  *   - `appends` (default): each committed append becomes one
  *     micro-batch of the table's rows. Manifest-diff batching is what
  *     makes this SOUND where a directory-watching file stream is not:
  *     staged-but-uncommitted crash debris (orphans awaiting vacuum)
  *     is never delivered, and a commit that rewrote files
  *     (merge/delete/compaction) is refused loudly instead of silently
  *     re-delivering every rewritten row as if it were new
  *     ([[graft.storage.ParquetCatalog.streamBatch]] enforces the
  *     append-only window).
  *   - `changes` (Delta `readChangeFeed`): each committed version —
  *     ANY verb — becomes one micro-batch of
  *     [[graft.storage.ParquetCatalog.tableChanges]] rows
  *     (insert / update_preimage / update_postimage / delete, with
  *     `_commit_version`), computed over the `keys` option. The
  *     CDC-shaped consumption the appends mode refuses.
  *
  * The engine checkpoints the processed version, so a restarted query
  * resumes at its high-water and every row is delivered exactly once.
  * Usage: `catalog.readStream(table)` / `catalog.readChangeStream
  * (table, keys)` — or `spark.readStream.format(
  * "graft.streaming.TableSourceProvider").option("root", r)
  * .option("table", t).load()`. `startingVersion` is an exclusive
  * floor: 0 replays the whole table (appends) or its full change
  * history (changes) as batch one; the current version streams only
  * the future. Retention contract: vacuum must keep every version a
  * lagging consumer still needs (Delta's rule) — a vacuumed-away
  * window fails loudly. */
class TableSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  private def resolve(sqlContext: SQLContext,
      parameters: Map[String, String]): (ParquetCatalog, String) = {
    val root = parameters.getOrElse("root",
      throw new IllegalArgumentException("option 'root' is required"))
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("option 'table' is required"))
    (new ParquetCatalog(sqlContext.sparkSession, root), table)
  }

  private def keysOf(parameters: Map[String, String]): Seq[String] = {
    val ks = parameters.getOrElse("keys", "").split(',').toSeq
      .map(_.trim).filter(_.nonEmpty)
    require(ks.nonEmpty, "mode=changes requires option 'keys' (merge keys)")
    ks
  }

  private def schemaFor(cat: ParquetCatalog, table: String,
      parameters: Map[String, String]): StructType =
    if (parameters.get("mode").contains("changes")) {
      // tableChanges with an empty window builds the exact feed shape
      // (keys, _change_type, data columns, _commit_version) at limit-0
      // cost — the schema a change stream pins at start
      val v = cat.currentVersion(table)
      cat.tableChanges(table, v, v, keysOf(parameters)).schema
    } else cat.read(table).schema

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (cat, table) = resolve(sqlContext, parameters)
    (shortName(), schema.getOrElse(schemaFor(cat, table, parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (cat, table) = resolve(sqlContext, parameters)
    val starting = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
    val changes = parameters.get("mode").contains("changes")
    new TableSource(sqlContext, cat, table,
      schema.getOrElse(schemaFor(cat, table, parameters)), starting,
      if (changes) Some(keysOf(parameters)) else None)
  }
}

/** One live stream over one table: offsets are committed versions.
  * `getOffset` is one manifest-dir listing (metadata-only); `getBatch`
  * reads exactly the files the window's manifests disagree on. The
  * schema is pinned at stream start — files predating a metadata-only
  * evolution resolve by name (absent columns read null), the catalog's
  * normal heterogeneous-file contract. `changeKeys` switches the batch
  * shape from appended rows to per-commit change rows. */
class TableSource(sqlContext: SQLContext, cat: ParquetCatalog,
    table: String, override val schema: StructType,
    startingVersion: Long, changeKeys: Option[Seq[String]] = None)
  extends Source {

  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[Offset] = {
    val v = cat.currentVersion(table)
    if (v <= startingVersion) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(version).getOrElse(startingVersion)
    val to = version(end)
    val batch = changeKeys match {
      case Some(keys) =>
        val cols = schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq
        cat.tableChanges(table, from, to, keys).select(cols: _*)
      case None => cat.streamBatch(table, from, to, schema)
    }
    GraftStreamFrame(sqlContext.sparkSession, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
