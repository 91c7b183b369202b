package graft.streaming

import graft.storage.ParquetCatalog
import org.apache.spark.sql.{DataFrame, GraftStreamFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
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
  * the future.
  *
  * **Admission control** (`maxVersionsPerTrigger`, Delta's
  * `maxFilesPerTrigger` semantics at version granularity): each
  * micro-batch's window is capped at N commits, so a consumer
  * restarting after a long gap drains in N-commit batches instead of
  * planning ONE catch-up batch the size of the backlog — at 100 TB the
  * difference between bounded incremental progress and a table-sized
  * shuffle. `Trigger.AvailableNow` is honored natively (the source
  * implements [[SupportsTriggerAvailableNow]], so Spark runs a real
  * multi-batch drain to the prepare-time bound and stops — no
  * single-batch downgrade, no WARN): rate limit + AvailableNow is the
  * bounded-backfill idiom.
  *
  * Retention contract: vacuum must keep every version a lagging
  * consumer still needs (Delta's rule) — a vacuumed-away window fails
  * LOUDLY at the next batch, naming the missing versions and the
  * remedy, never delivering a silently-wrong batch.
  *
  * Design note: this is a V1 `Source` implementing the DSv2 admission
  * interfaces — exactly how Spark's own `FileStreamSource` and Delta's
  * `DeltaSource` ship (both are V1 sources with
  * `SupportsAdmissionControl`/`SupportsTriggerAvailableNow`;
  * `MicroBatchExecution` dispatches on the INTERFACES, not the API
  * generation). A full DSv2 `MicroBatchStream` was considered and
  * rejected: its executor-side `PartitionReader` contract would force
  * re-implementing the parquet scan by hand (losing vectorization and
  * whole-stage codegen) and cannot express the `changes` mode at all —
  * a CDC batch is a keyed JOIN of two file subsets, not a list of
  * scannable partitions. `getBatch` returning a Catalyst-planned
  * DataFrame is the point, not a legacy artifact. */
class TableSourceProvider extends StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

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
    def positive(opt: String): Option[Long] = parameters.get(opt).map { s =>
      val n = s.toLong
      require(n > 0, s"$opt must be positive, got $n")
      n
    }
    new TableSource(sqlContext, cat, table,
      schema.getOrElse(schemaFor(cat, table, parameters)), starting,
      if (changes) Some(keysOf(parameters)) else None,
      positive("maxVersionsPerTrigger"), positive("maxFilesPerTrigger"),
      positive("maxBytesPerTrigger"))
  }

  /** The WRITE half (`df.writeStream.format("graft.streaming
    * .TableSourceProvider")...`): every micro-batch lands as ONE
    * replay-idempotent catalog commit — the txn-registry exactly-once
    * contract ([[graft.storage.ParquetCatalog.appendBatch]]), the same
    * protocol the `foreachBatch` sinks use, behind a format string.
    * Options: `root`/`table` (required); `keys` switches from
    * append-per-batch to MERGE-per-batch
    * ([[graft.storage.ParquetCatalog.upsertBatch]], update-shaped
    * streams); `partitionBy` (comma list — `.partitionBy(...)` on the
    * writer works too); `sinkId` overrides the exactly-once identity
    * (default: the query's `checkpointLocation`, which IS the replay
    * domain). `Complete` output mode (streaming aggregates) maps to
    * one versioned OVERWRITE per batch under the same replay token —
    * each batch is the full result, so the table always holds exactly
    * the latest aggregate with history retained. A commit race against
    * an interleaved writer retries boundedly — safe, because the batch
    * token makes a replayed commit a no-op regardless of which attempt
    * landed. */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val (cat, table) = resolve(sqlContext, parameters)
    val complete = outputMode == OutputMode.Complete()
    require(outputMode == OutputMode.Append() ||
        outputMode == OutputMode.Update() || complete,
      s"graft-table sink supports Append/Update/Complete modes, got $outputMode")
    val keys = parameters.get("keys").map(_.split(',').toSeq
      .map(_.trim).filter(_.nonEmpty)).filter(_.nonEmpty)
    require(keys.isDefined || outputMode != OutputMode.Update(),
      "Update mode needs the 'keys' option (MERGE-per-batch)")
    require(keys.isEmpty || !complete,
      "Complete mode overwrites per batch; 'keys' has no effect — drop it")
    val pb =
      if (partitionColumns.nonEmpty) partitionColumns
      else parameters.get("partitionBy").toSeq
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    // canonicalize to an absolute normalized path: the SAME checkpoint
    // spelled differently across restarts (relative vs absolute,
    // trailing slash, ./ segments) must yield the SAME txn identity,
    // or every replayed batch re-commits as a duplicate. ONLY plain
    // local paths and file: URIs canonicalize — any other scheme
    // (s3a://, hdfs://, abfss://) passes through VERBATIM: resolving it
    // against the driver's CWD would mint a DIFFERENT identity per app
    // attempt (cluster restarts get fresh container dirs), re-committing
    // replayed batches as duplicates
    def canonical(p: String): String = {
      // single-letter "schemes" are Windows drive letters (the standard
      // Hadoop/java.nio heuristic), not URI schemes — canonicalize them
      val scheme = "^[A-Za-z][A-Za-z0-9+.-]+:".r.findPrefixOf(p)
      if (scheme.exists(s => !s.equalsIgnoreCase("file:"))) p
      else {
        val path =
          if (scheme.isDefined)
            try new java.net.URI(p).getPath catch { case _: Exception => p }
          else p
        if (path == null) p
        else
          try java.nio.file.Paths.get(path).toAbsolutePath.normalize.toString
          catch { case _: Exception => p }
      }
    }
    val sinkId = parameters.get("sinkId")
      .orElse(parameters.get("checkpointLocation").map(canonical))
      .getOrElse(throw new IllegalArgumentException(
        "graft-table sink needs a stable exactly-once identity: set " +
          "option 'checkpointLocation' (the usual one) or 'sinkId'"))
    // migration: sinks that ran BEFORE canonicalization committed their
    // high-water under the RAW spelling — that identity must keep
    // answering replay probes, or the first restart after an upgrade
    // re-commits the last delivered batch as a duplicate
    val legacyId = parameters.get("checkpointLocation")
      .filter(raw => parameters.get("sinkId").isEmpty && raw != sinkId)
    new TableSink(cat, table, pb, keys, sinkId, complete, legacyId)
  }
}

/** One live sink over one table: each `addBatch` is one idempotent
  * versioned commit keyed `<sinkId>#<batchId>` — re-delivered batches
  * (restart replay) commit nothing, and the registry survives vacuum.
  * The engine's micro-batch frame is re-planned as a batch frame
  * ([[GraftStreamFrame.batch]]) so the catalog's ordinary write path —
  * schema guard, constraint guard, manifest CAS — applies unchanged. */
class TableSink(cat: ParquetCatalog, table: String, partitionBy: Seq[String],
    keys: Option[Seq[String]], sinkId: String,
    complete: Boolean = false,
    legacyId: Option[String] = None) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // a batch the PRE-canonicalization identity already committed is a
    // replay, not new work (one registry lookup; new high-waters then
    // accumulate under the canonical id)
    if (legacyId.exists(l =>
        cat.sinkHighWater(table, l).exists(_ >= batchId))) return
    val df = GraftStreamFrame.batch(data.sparkSession,
      data.queryExecution.toRdd, data.schema)
    val token = s"$sinkId#$batchId"
    cat.withRetry() {
      if (complete)
        // Complete mode: each batch IS the full result (streaming
        // aggregates) — one versioned overwrite per batch, the same
        // replay token making re-delivered batches no-ops
        cat.overwriteVersioned(table, df, partitionBy, Some(token))
      else keys match {
        case Some(ks) => cat.upsertBatch(table, df, ks, token,
          partitionBy = partitionBy)
        case None => cat.appendBatch(table, df, token, partitionBy)
      }
    }
    ()
  }

  override def toString: String = s"GraftTableSink($table)"
}

/** One live stream over one table: offsets are committed versions.
  * Offset resolution is one manifest-dir listing (metadata-only);
  * `getBatch` reads exactly the files the window's manifests disagree
  * on. The schema is pinned at stream start — files predating a
  * metadata-only evolution resolve by name (absent columns read null),
  * the catalog's normal heterogeneous-file contract. `changeKeys`
  * switches the batch shape from appended rows to per-commit change
  * rows; `maxVersionsPerTrigger` caps each batch's commit window. */
class TableSource(sqlContext: SQLContext, cat: ParquetCatalog,
    table: String, override val schema: StructType,
    startingVersion: Long, changeKeys: Option[Seq[String]] = None,
    maxVersionsPerTrigger: Option[Long] = None,
    maxFilesPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None)
  extends Source with SupportsTriggerAvailableNow {

  private def version(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  /** AvailableNow drain target: pinned when the trigger starts, so the
    * query processes exactly the data available THEN and stops —
    * commits racing the drain wait for the next run. */
  @volatile private var availableNowBound: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowBound = Some(cat.currentVersion(table))

  /** The cap is applied INSIDE [[latestOffset]] (versions are this
    * source's own unit; Spark's ReadLimit vocabulary only knows rows
    * and files, and the limit is enforced by the source either way). */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The next micro-batch's end offset: the current committed version,
    * clamped by the AvailableNow bound, the per-trigger version cap,
    * and the per-trigger FILE and BYTE caps (both counted from raw
    * manifests — one metadata parse per admitted version; bytes come
    * from the `bytesAdded` meta each commit records, Delta's
    * `maxFilesPerTrigger`/`maxBytesPerTrigger` discipline; a single
    * oversized commit still admits alone, so progress is always
    * possible). Returning the start offset unchanged signals "caught
    * up". */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val from = Option(start).map(version).getOrElse(startingVersion)
    val live = cat.currentVersion(table)
    val bounded = availableNowBound.fold(live)(math.min(live, _))
    val capped = maxVersionsPerTrigger.fold(bounded)(n =>
      math.min(bounded, from + n))
    val end =
      if (maxFilesPerTrigger.isEmpty && maxBytesPerTrigger.isEmpty) capped
      else {
        var v = from
        var files = 0L
        var bytes = 0L
        var open = true
        // the per-version metadata probe can hit a vacuumed-away window
        // just like getBatch — same loud remedy, not the raw error;
        // ONE raw-manifest parse per examined version answers both caps
        try while (open && v < capped) {
          val (addF, addB) = cat.admissionStats(table, v + 1,
            needBytes = maxBytesPerTrigger.isDefined)
          val over = maxFilesPerTrigger.exists(files + addF > _) ||
            maxBytesPerTrigger.exists(bytes + addB > _)
          // an oversized single commit still admits alone (v == from),
          // so the stream can never stall
          if (v > from && over) open = false
          else { v += 1; files += addF; bytes += addB }
        } catch {
          case e: IllegalArgumentException
              if e.getMessage != null && e.getMessage.contains("not retained") =>
            retentionError(from, capped, e)
        }
        v
      }
    if (end <= from) start else LongOffset(end)
  }

  private def retentionError(from: Long, to: Long, e: Throwable): Nothing =
    throw new IllegalStateException(
      s"stream over '$table' needs the version window ($from, $to] " +
        s"but part of it is no longer retained (${e.getMessage}): " +
        "vacuum removed versions this checkpoint still needs. " +
        "Re-bootstrap the consumer with a fresh checkpoint (full " +
        "replay), or vacuum with a keep window covering the " +
        "laggiest consumer", e)

  override def reportLatestOffset(): OffsetV2 =
    LongOffset(cat.currentVersion(table))

  override def initialOffset(): OffsetV2 = LongOffset(startingVersion)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  /** Legacy V1 polling path — kept for API completeness; the engine
    * prefers the [[latestOffset]] admission-control path. Note this
    * path cannot rate-limit (no start offset is supplied). */
  override def getOffset: Option[Offset] = {
    val v = cat.currentVersion(table)
    if (v <= startingVersion) None else Some(LongOffset(v))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(o => version(o)).getOrElse(startingVersion)
    val to = version(end)
    val batch =
      try changeKeys match {
        case Some(keys) =>
          val cols = schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq
          cat.tableChanges(table, from, to, keys).select(cols: _*)
        case None => cat.streamBatch(table, from, to, schema)
      } catch {
        case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("not retained") =>
          retentionError(from, to, e)
      }
    GraftStreamFrame(sqlContext.sparkSession, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
