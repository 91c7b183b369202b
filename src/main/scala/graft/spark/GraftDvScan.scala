package graft.spark

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{InternalRow, ProjectingInternalRow}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.graftbridge.RowIndexBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The registered catalog's DELETION-VECTOR read path. The stock DSv2
  * `ParquetScan` reads files directly, so a vectored table would
  * RESURRECT deleted rows through plain `spark.sql` reads — this
  * wrapper anti-filters each row's vectored POSITION at the
  * partition-reader level (Delta's row-index filter, expressed in V2
  * terms):
  *
  *   - each row's file position rides the parquet readers' GENERATED
  *     row-index column ([[RowIndexBridge.TemporaryColumnName]],
  *     appended to the inner scan's `readDataSchema` and projected
  *     away after the filter) — computed from row-group metadata, so
  *     it stays correct under row-group/page skipping and splits,
  *     which is exactly what lets data-filter pushdown stay ON (the
  *     engine read path relies on the same `_metadata.row_index`
  *     mechanism);
  *   - ONE file (split) per input partition, so the reader wrapper
  *     knows which file's vector to consult;
  *   - the vectors load once per scan on the driver and ride a
  *     broadcast to the per-file reader wrappers;
  *   - every filter is still REPORTED as post-scan, so Spark
  *     re-applies the full predicate above the scan — parquet
  *     pushdown is best-effort row-group pruning, never the only
  *     evaluation, and results stay identical by construction.
  */
class GraftDvScanBuilder(inner: ScanBuilder, sidecars: Seq[String],
    partitionCols: Seq[String],
    statsPath: Option[java.nio.file.Path] = None,
    bucketOf: Option[(String, Int)] = None)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.graftbridge.CatalystFilterPushdownBridge {

  private var preds: Seq[(String, Double, Double, Set[String])] = Nil
  private var points: Seq[(String, Seq[Any])] = Nil
  private var strPreds: Seq[(String, Option[String], Option[String])] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit = inner match {
    case p: SupportsPushDownRequiredColumns => p.pruneColumns(requiredSchema)
    case _ => ()
  }

  /** Forward ALL deterministic filters: the inner `ParquetScanBuilder`
    * splits them into partition pruning (file-granular) and parquet
    * data pushdown (row-group pruning) itself, and both are
    * position-safe under the row-index mechanism. Numeric range
    * conjuncts are also kept for index file-skipping (vectored engine
    * reads are index-pruned; the SQL door matches — dropping a whole
    * file never perturbs the surviving files' row positions). */
  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]):
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    if (statsPath.isDefined) {
      preds = GraftFileSkipping.rangeConjuncts(filters)
      points = GraftFileSkipping.pointConjuncts(filters)
      strPreds = GraftFileSkipping.stringRangeConjuncts(filters)
    }
    org.apache.spark.sql.graftbridge.CatalystFilterPushdownBridge
      .push(inner, filters.filter(_.deterministic))
    filters // everything re-applies above the scan
  }

  /** Nothing is reported as pushed: the planner must keep the full
    * predicate (pushed filters prune row groups; they are never the
    * only evaluation). */
  override def pushedFilters():
      Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  override def build(): Scan = inner.build() match {
    case p: ParquetScan
        if !p.readSchema().fieldNames.contains(RowIndexBridge.TemporaryColumnName) =>
      // under Spark's SPJ opt-in, a vectored PARTITIONED table also
      // reports its layout (the one-split-per-file plan already keys
      // naturally) — but only when every partition column survived
      // pruning, mirroring [[GraftSpjScanBuilder]]. A vectored
      // BUCKETED table reports bucket(n, col) with any surviving
      // identity prefix (r19 — previously dv silently LOST the bucket
      // layout and every co-bucketed join shuffled).
      val spjOn = SparkSession.active.conf
        .get("spark.sql.sources.v2.bucketing.enabled", "false").toBoolean
      val bucketMode = spjOn && bucketOf.exists { case (bc, _) =>
        p.readSchema().fieldNames.exists(_.equalsIgnoreCase(bc)) }
      val reportBy =
        if (bucketMode)
          partitionCols.dropRight(1).filter(c => p.readPartitionSchema
            .fieldNames.exists(_.equalsIgnoreCase(c)))
        else if (spjOn && partitionCols.nonEmpty && partitionCols.forall(c =>
            p.readPartitionSchema.fieldNames.exists(_.equalsIgnoreCase(c))))
          partitionCols
        else Nil
      new GraftDvScan(p.copy(readDataSchema = p.readDataSchema
        .add(StructField(RowIndexBridge.TemporaryColumnName, LongType))),
        sidecars, statsPath, preds, points, reportBy,
        if (bucketMode) bucketOf else None, strPreds)
    case other => throw new IllegalStateException(
      "GraftDvScan wraps Spark's ParquetScan (a column named " +
        s"'${RowIndexBridge.TemporaryColumnName}' also conflicts); got " +
        other.getClass.getName)
  }
}

class GraftDvScan(inner: ParquetScan, sidecars: Seq[String],
    statsPath: Option[java.nio.file.Path] = None,
    preds: Seq[(String, Double, Double, Set[String])] = Nil,
    points: Seq[(String, Seq[Any])] = Nil,
    partitionBy: Seq[String] = Nil,
    bucketOf: Option[(String, Int)] = None,
    strPreds: Seq[(String, Option[String], Option[String])] = Nil)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  /** STORAGE-PARTITIONED JOINS compose with vectors (the r17 verdict's
    * last wrapper gap): the positional scan already plans ONE split per
    * file, so attaching each split's partition key and reporting
    * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
    * costs nothing — a co-partitioned join where one side carries a
    * deletion vector stops shuffling BOTH sides. `partitionBy` arrives
    * non-empty only under Spark's SPJ opt-in with every partition
    * column surviving pruning (builder-gated); otherwise the scan
    * reports unknown partitioning exactly as before. */
  private lazy val pSchema = inner.readPartitionSchema
  private lazy val keyOrdinals: Seq[Int] = partitionBy.map(c =>
    pSchema.fieldNames.indexWhere(_.equalsIgnoreCase(c)))

  private def keyed: Boolean = partitionBy.nonEmpty || bucketOf.isDefined
  private lazy val keyTypes =
    keyOrdinals.map(pSchema(_).dataType) ++
      bucketOf.map(_ => org.apache.spark.sql.types.IntegerType)

  /** Frozen at first read (pre-runtime-filter), so the reported
    * partitioning stays stable across `filter()` re-plans —
    * `BatchScanExec` itself verifies the filtered keys against it. */
  private lazy val distinctKeys: Int = planInputPartitions().toSeq.collect {
    case k: GraftKeyedPartition => k.partitionKey().toSeq(keyTypes)
  }.distinct.length

  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (!keyed)
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    else {
      import org.apache.spark.sql.connector.expressions.{Expression => VExpr,
        Expressions}
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        (partitionBy.map(c => Expressions.identity(c): VExpr) ++
          bucketOf.map { case (c, n) => Expressions.bucket(n, c): VExpr })
          .toArray[VExpr],
        distinctKeys)
    }

  /** Dynamic partition pruning ([[GraftFileSkipping.runtimeKeep]]):
    * whole-file drops by partition value never perturb surviving
    * files' row positions, so the vector anti-filter is unaffected —
    * and the same is true of bucket-id drops and index-driven runtime
    * FILE drops (r19), both file-granular. */
  override def filterAttributes(): Array[
      org.apache.spark.sql.connector.expressions.NamedReference] = {
    val indexed = statsPath.toSeq.flatMap(sp =>
      graft.storage.SkippingIndex.columnsAtCached(sp))
      .filter(c => inner.readDataSchema.fieldNames.exists(_.equalsIgnoreCase(c)))
    (inner.readPartitionSchema.fieldNames.toSeq ++ bucketOf.map(_._1) ++ indexed)
      .distinct
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray
  }
  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    synchronized { runtimePreds = predicates }

  private var runtimePreds: Array[
    org.apache.spark.sql.connector.expressions.filter.Predicate] = Array.empty

  /** The stock scan's size/row estimates pass through, index-tightened
    * when planned conjuncts prune (r20 — shared
    * [[GraftFileSkipping.tightenedStatistics]]). Slightly high either
    * way (vectored-out rows still count), but an estimate beats the
    * conf default, which reads as infinite and kills broadcast
    * planning for joins INVOLVING a vectored table. */
  // memoized: re-requested at each AQE re-optimization, conjuncts fixed
  private lazy val tightened =
    GraftFileSkipping.tightenedStatistics(inner, statsPath, preds, strPreds)
  override def estimateStatistics():
      org.apache.spark.sql.connector.read.Statistics = tightened

  /** The inner scan reads [data..., row-index, partitions...]; the
    * row index is wrapper-internal and never surfaces. */
  private val innerSchema: StructType = inner.readSchema()
  private val ridxOrdinal: Int =
    innerSchema.fieldIndex(RowIndexBridge.TemporaryColumnName)
  private val outSchema: StructType =
    StructType(innerSchema.fields.filterNot(
      _.name == RowIndexBridge.TemporaryColumnName))

  override def readSchema(): StructType = outSchema

  override def toBatch: Batch = this

  override def description(): String = s"GraftDvScan(${inner.description()})"

  /** Re-plan as ONE file split per input partition (stock planning
    * bins several small files into one partition, which would hide
    * file boundaries from the reader wrapper). Splits of one file stay
    * separate partitions — row indexes are file-absolute. With an
    * index present, non-candidate files drop out first (file-granular,
    * so surviving files' row positions are untouched). */
  override def planInputPartitions(): Array[InputPartition] = {
    val rtPreds = synchronized { runtimePreds }
    val keep = GraftFileSkipping.runtimeKeep(rtPreds, inner.readPartitionSchema)
    val planned = inner.toBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"GraftDvScan expected file partitions, got $other")
    }.filter(keep)
    // planned + runtime conjuncts both ride the index pass — all
    // whole-file drops, so surviving files' row positions are intact
    val (rPreds, rPoints, rStrs) =
      if (statsPath.isDefined && rtPreds.nonEmpty)
        GraftFileSkipping.runtimeIndexConjuncts(rtPreds, inner.readDataSchema)
      else (Nil, Nil, Nil)
    val allPreds = preds ++ rPreds
    val allPoints = points ++ rPoints
    val allStrs = strPreds ++ rStrs
    val indexKept = statsPath match {
      case Some(sp) if allPreds.nonEmpty || allPoints.nonEmpty ||
          allStrs.nonEmpty =>
        GraftFileSkipping.filterSplits(sp, allPreds, allPoints, planned,
          allStrs)._1
      case _ => planned
    }
    // runtime bucket pruning: values over the bucketed DATA column
    // hash to allowed ids; a file in another bucket cannot match
    val files = GraftSpjScan.allowedBuckets(rtPreds, inner.readSchema(),
        bucketOf) match {
      case Some(ids) => indexKept.filter(f =>
        ids.contains(GraftSpjScan.bucketIdOf(f.filePath.toString)))
      case None => indexKept
    }
    files.zipWithIndex.map { case (f, i) =>
      val fp = FilePartition(i, Array(f))
      if (!keyed) fp: InputPartition
      else {
        val prefixVals = keyOrdinals.map(o =>
          f.partitionValues.get(o, pSchema(o).dataType))
        val key = bucketOf match {
          case Some(_) => prefixVals :+
            (GraftSpjScan.bucketIdOf(f.filePath.toString): Any)
          case None => prefixVals
        }
        GraftKeyedPartition(fp,
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            key.toArray))
      }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    // the positions load onto the DRIVER once per scan — bounded, like
    // the engine read path's broadcast cap: a table that accumulated
    // more vector bytes than this needs compaction, not a driver OOM
    val bytes = sidecars.map { p =>
      try java.nio.file.Files.size(java.nio.file.Paths.get(p))
      catch { case _: Exception => Long.MaxValue / 1024 }
    }.sum
    require(bytes <= GraftDvScan.MaxDriverVectorBytes,
      s"this table's deletion vectors total $bytes bytes — too large to " +
        "apply on the SQL scan path. Run OPTIMIZE (compaction " +
        "materializes the deletes and sheds the vectors), then re-query.")
    val dv: Map[String, Array[Long]] =
      spark.read.parquet(sidecars: _*).select("file", "pos").collect()
        .groupBy(r => GraftDvScan.baseName(r.getString(0)))
        .map { case (b, rows) => b -> rows.map(_.getLong(1)).distinct.sorted }
    new GraftDvReaderFactory(inner.toBatch.createReaderFactory(),
      spark.sparkContext.broadcast(dv), outSchema, ridxOrdinal,
      innerSchema.length)
  }
}

object GraftDvScan {
  private[spark] def baseName(p: String): String =
    p.substring(p.lastIndexOf('/') + 1)

  /** Same order as the engine path's broadcast cap
    * (`ParquetCatalog.dvBroadcastBytes`). DOCUMENTED DIVERGENCE: above
    * this, the engine read path degrades to a shuffled anti-join while
    * this SQL-door scan REFUSES loudly — a DSv2 reader factory must
    * materialize the positions driver-side (there is no shuffle to
    * degrade to), and a silent driver OOM would be worse than the
    * refusal. The remedy (OPTIMIZE / REORG PURGE) restores both doors. */
  private[spark] val MaxDriverVectorBytes: Long = 64L << 20
}

class GraftDvReaderFactory(inner: PartitionReaderFactory,
    dv: Broadcast[Map[String, Array[Long]]], outSchema: StructType,
    ridxOrdinal: Int, innerWidth: Int) extends PartitionReaderFactory {

  /** Row readers only: the positional wrapper filters row by row. */
  override def supportColumnarReads(p: InputPartition): Boolean = false

  /** SPJ-keyed partitions unwrap back to their one-file split. */
  private def unwrap(p: InputPartition): FilePartition = p match {
    case k: GraftKeyedPartition => k.delegate
    case fp: FilePartition => fp
    case other => throw new IllegalStateException(
      s"GraftDvReaderFactory expected a file partition, got $other")
  }

  override def createReader(p0: InputPartition): PartitionReader[InternalRow] = {
    val p = unwrap(p0)
    val r = inner.createReader(p)
    val file = p.files.head.filePath.toString
    val pos = dv.value.getOrElse(GraftDvScan.baseName(file), Array.emptyLongArray)
    // project the wrapper-internal row-index column away (a mutable
    // view, the standard reader row-reuse contract)
    val out = ProjectingInternalRow(outSchema,
      (0 until innerWidth).filterNot(_ == ridxOrdinal))
    new PartitionReader[InternalRow] {
      override def next(): Boolean = {
        while (r.next()) {
          if (pos.isEmpty ||
              java.util.Arrays.binarySearch(pos,
                r.get().getLong(ridxOrdinal)) < 0) return true
        }
        false
      }
      override def get(): InternalRow = { out.project(r.get()); out }
      override def close(): Unit = r.close()
    }
  }
}
