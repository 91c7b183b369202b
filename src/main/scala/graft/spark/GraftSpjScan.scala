package graft.spark

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, Expression => VExpression}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** STORAGE-PARTITIONED JOINS for the registered catalog (Spark's SPJ,
  * SPARK-37377 — the mechanism Iceberg uses): the manifest already
  * partitions every versioned table hive-style, so a scan can REPORT
  * that layout as a DSv2 [[KeyGroupedPartitioning]] over the identity
  * transforms of the partition columns. Catalyst then treats the scan
  * as pre-clustered on those keys:
  *
  *   - a join of two tables co-partitioned on the same key needs NO
  *     shuffle on either side — at 100 TB that is the difference
  *     between a metadata-aligned zipped join and re-shuffling both
  *     relations across the cluster;
  *   - a `GROUP BY` on the partition columns aggregates
  *     shuffle-free (the reported partitioning satisfies the
  *     aggregate's ClusteredDistribution).
  *
  * Opt-in via Spark's own switch (`spark.sql.sources.v2.bucketing
  * .enabled`, same knob Iceberg keys on) because the trade is real:
  * when the partitioning is reported, Spark groups the scan's splits
  * one task per partition VALUE, so a non-join full scan of a
  * 1000-partition table runs at most 1000-way parallel regardless of
  * split count. Skewed/misaligned layouts are Spark's own department
  * (`...bucketing.partiallyClusteredDistribution.enabled`,
  * `...bucketing.pushPartValues.enabled`) — the per-split partitions
  * this scan emits carry their keys individually, which is exactly the
  * shape those features need. Deletion-vectored tables keep their
  * positional scan ([[GraftDvScan]]) — correctness outranks the saved
  * shuffle — and aggregate-pushdown scans (schema replaced by partial
  * aggregates) stay unwrapped.
  *
  * The wrapper forwards ALL pushdown verbatim (filters, pruning,
  * aggregates) and delegates split planning to the stock
  * `ParquetScan`, re-keying each planned split by its partition value
  * — so pruning, pushdown, vectorized reads, and split sizing are
  * byte-identical to the unwrapped scan; only the REPORTED layout and
  * the split→task grouping change. */
class GraftSpjScanBuilder(inner: ScanBuilder, partitionBy: Seq[String],
    statsPath: Option[java.nio.file.Path] = None,
    bucketOf: Option[(String, Int)] = None)
  extends GraftForwardingScanBuilder(inner) {

  private var preds: Seq[(String, Double, Double, Set[String])] = Nil
  private var points: Seq[(String, Seq[Any])] = Nil
  private var strPreds: Seq[(String, Option[String], Option[String])] = Nil

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]):
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    if (statsPath.isDefined) {
      preds = GraftFileSkipping.rangeConjuncts(filters)
      points = GraftFileSkipping.pointConjuncts(filters)
      strPreds = GraftFileSkipping.stringRangeConjuncts(filters)
    }
    super.pushFilters(filters)
  }

  /** Wrap only when every partition column survived pruning (a query
    * that never reads them cannot join/group on them, and reporting
    * keys the plan cannot resolve would break planning) and no
    * aggregate was pushed (the scan then emits partial-agg rows whose
    * grouping is not the table layout). In BUCKET mode the resolvable
    * reference is the bucketed DATA column instead (the reported
    * transform is `bucket(n, col)`, whose key values come from the
    * layout's bucket-id dirs, not from output columns) — and a
    * COMPOSITE layout's identity prefix keys additionally on every
    * prefix column that survived pruning. Degrading to FEWER key
    * components is always sound: splits that differ only in a dropped
    * component share a reported key and Spark groups them into one
    * task — so a key-only join over a date-partitioned+bucketed fact
    * (the date consumed by its filter) reports plain `bucket(n, col)`
    * and aligns with an un-partitioned co-bucketed dim with no
    * subset-join-keys session flag needed. */
  override def build(): Scan = inner.build() match {
    case p: ParquetScan if !aggPushed && bucketOf.exists { case (c, _) =>
        p.readSchema().fieldNames.exists(_.equalsIgnoreCase(c)) } =>
      val prefix = partitionBy.filter(c =>
        p.readPartitionSchema.fieldNames.exists(_.equalsIgnoreCase(c)))
      // statsPath passes through even without planned conjuncts — the
      // index also serves RUNTIME dynamic file pruning (r19)
      new GraftSpjScan(p, prefix, statsPath, preds, points, bucketOf,
        strPreds)
    case p: ParquetScan if !aggPushed && bucketOf.isEmpty &&
        partitionBy.forall(c =>
          p.readPartitionSchema.fieldNames.exists(_.equalsIgnoreCase(c))) =>
      new GraftSpjScan(p, partitionBy, statsPath, preds, points,
        strPreds = strPreds)
    case other => other
  }
}

class GraftSpjScan(inner: ParquetScan, partitionBy: Seq[String],
    statsPath: Option[java.nio.file.Path] = None,
    preds: Seq[(String, Double, Double, Set[String])] = Nil,
    points: Seq[(String, Seq[Any])] = Nil,
    bucketOf: Option[(String, Int)] = None,
    strPreds: Seq[(String, Option[String], Option[String])] = Nil)
  extends Scan with Batch with SupportsReportPartitioning
  with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = this
  override def description(): String = statsPath match {
    case Some(_) =>
      val _ = keyedSplits // force the counts
      s"GraftSpjScan(kept=$keptFiles of $totalFiles files, ${inner.description()})"
    case None => s"GraftSpjScan(${inner.description()})"
  }
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
  override def supportedCustomMetrics():
      Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    inner.supportedCustomMetrics()

  /** The stock scan's size/row estimates pass through, TIGHTENED by
    * the index when planned conjuncts prune
    * ([[GraftFileSkipping.tightenedStatistics]]) — without estimates a
    * wrapped relation reports the conf default (effectively infinite)
    * and the planner stops broadcasting it in OTHER joins; without
    * tightening, a filtered slice of a bucketed fact looks
    * full-table-sized to the broadcast planner. */
  // memoized: re-requested at each AQE re-optimization, conjuncts fixed
  private lazy val tightened =
    GraftFileSkipping.tightenedStatistics(inner, statsPath, preds, strPreds)
  override def estimateStatistics():
      org.apache.spark.sql.connector.read.Statistics = tightened

  /** Key ordinals into the read PARTITION schema, in reported-key
    * order — `partitionKey()` rows must line up positionally with
    * [[outputPartitioning]]'s key expressions. */
  private val pSchema = inner.readPartitionSchema
  private val keyOrdinals: Seq[Int] = partitionBy.map(c =>
    pSchema.fieldNames.indexWhere(_.equalsIgnoreCase(c)))

  /** The stock scan's own splits (pruning/split sizing already
    * applied), index-filtered when the table carries stats
    * ([[GraftFileSkipping.filterSplits]] — skipping composes with the
    * reported layout: a dropped file only removes rows the predicate
    * excludes, so key-grouped alignment is unaffected), each re-keyed
    * by its partition value. Splits stay one-per-InputPartition —
    * Spark's exec groups same-key splits into tasks itself (and can
    * split them back out for skew under partially-clustered SPJ). */
  private var keptFiles = 0
  private var totalFiles = 0
  private lazy val keyedSplits: Array[GraftKeyedPartition] = {
    val planned = inner.toBatch.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"GraftSpjScan expected file partitions, got $other")
    }
    val files = statsPath match {
      case Some(sp) =>
        val (kept, k, t) =
          GraftFileSkipping.filterSplits(sp, preds, points, planned, strPreds)
        keptFiles = k; totalFiles = t; kept
      case None => planned
    }
    files.zipWithIndex.map { case (f, i) =>
      // bucket mode: the trailing key component is the file's bucket
      // id, recovered from its `_gbucket=<id>` layout dir (the read
      // schema need not — and usually does not — carry the synthetic
      // column); a composite layout's identity prefix values lead
      val prefixVals = keyOrdinals.map(o =>
        f.partitionValues.get(o, pSchema(o).dataType))
      val key = new GenericInternalRow(bucketOf match {
        case Some(_) => (prefixVals :+
          (GraftSpjScan.bucketIdOf(f.filePath.toString): Any)).toArray
        case None => prefixVals.toArray
      })
      GraftKeyedPartition(FilePartition(i, Array(f)), key)
    }
  }

  /** Dynamic partition pruning over the reported keys: Spark's
    * `BatchScanExec` re-plans after `filter` and itself verifies the
    * surviving keys against [[outputPartitioning]] (the SPJ machinery
    * handles dropped groups via its push-part-values path, exactly as
    * with Iceberg). [[distinctKeys]] stays the UNFILTERED count so the
    * reported partitioning is stable across the re-plan. In BUCKET
    * mode the filterable attribute is the bucketed DATA column:
    * runtime IN values hash through [[GraftBoundBucket]] (the same
    * function that laid the files out) to a set of allowed bucket ids
    * — sound because a file in bucket b contains ONLY values hashing
    * to b, so it cannot contain any listed value hashing elsewhere. */
  override def filterAttributes(): Array[
      org.apache.spark.sql.connector.expressions.NamedReference] = {
    // runtime filters are accepted over the identity key columns, the
    // bucketed data column, AND any indexed data column — the last is
    // what routes a join's runtime IN-list into the min/max + bloom
    // pass (dynamic FILE pruning, r19), which plain GraftSkipScan
    // already had and SPJ scans previously lost entirely
    val indexed = statsPath.toSeq.flatMap(sp =>
      graft.storage.SkippingIndex.columnsAtCached(sp))
      .filter(c => inner.readDataSchema.fieldNames.exists(_.equalsIgnoreCase(c)))
    (partitionBy ++ bucketOf.map(_._1) ++ indexed).distinct
      .map(Expressions.column).toArray
  }
  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    synchronized { runtimePreds = predicates }

  private var runtimePreds: Array[
    org.apache.spark.sql.connector.expressions.filter.Predicate] = Array.empty

  /** Bucket ids the runtime IN/= values allow — None when any
    * predicate shape/type is unrecognized (then nothing prunes). */
  private def allowedBuckets(): Option[Set[Int]] =
    GraftSpjScan.allowedBuckets(runtimePreds, inner.readSchema(), bucketOf)

  private lazy val distinctKeys: Int = {
    val types = keyOrdinals.map(pSchema(_).dataType) ++
      bucketOf.map(_ => org.apache.spark.sql.types.IntegerType)
    keyedSplits.map(_.partitionKey().toSeq(types)).distinct.length
  }

  override def outputPartitioning(): Partitioning = bucketOf match {
    case Some((c, n)) =>
      // the bucket transform resolves through the catalog's own
      // FunctionCatalog ([[GraftBucketFunction]]) — Iceberg's pattern;
      // composite layouts lead with their identity prefix (Iceberg's
      // `days(ts), bucket(16, id)` multi-transform spec)
      new KeyGroupedPartitioning(
        (partitionBy.map(Expressions.identity) :+ Expressions.bucket(n, c))
          .toArray[VExpression], distinctKeys)
    case None =>
      new KeyGroupedPartitioning(
        partitionBy.map(Expressions.identity).toArray[VExpression], distinctKeys)
  }

  override def planInputPartitions(): Array[InputPartition] = synchronized {
    if (runtimePreds.isEmpty) keyedSplits.toArray[InputPartition]
    else {
      // identity components prune by partition value (composite
      // prefixes included — runtimeKeep resolves by name and ignores
      // predicates over non-partition columns)…
      val keep = GraftFileSkipping.runtimeKeep(runtimePreds, pSchema)
      val byPart = keyedSplits.filter(k => k.delegate.files.forall(keep))
      // …in bucket mode, runtime values over the bucketed DATA column
      // hash to allowed bucket ids (the key's trailing component)…
      val byBucket = (bucketOf, allowedBuckets()) match {
        case (Some(_), Some(ids)) =>
          byPart.filter(k =>
            ids.contains(k.partitionKey().getInt(keyOrdinals.length)))
        case _ => byPart
      }
      // …and runtime IN/= over INDEXED data columns ride the same
      // min/max + bloom pass as planned conjuncts (dynamic FILE
      // pruning on the persisted index, r19). Sound like every other
      // index path: dropping a file only removes rows the runtime
      // equi-join predicate excludes, so key-grouped alignment is
      // unaffected; unrecognized shapes contribute nothing.
      statsPath match {
        case Some(sp) =>
          val (rPreds, rPoints, rStrs) = GraftFileSkipping.runtimeIndexConjuncts(
            runtimePreds, inner.readDataSchema)
          if (rPreds.isEmpty && rPoints.isEmpty && rStrs.isEmpty)
            byBucket.toArray[InputPartition]
          else {
            val files = byBucket.flatMap(_.delegate.files)
            val (kept, _, _) =
              GraftFileSkipping.filterSplits(sp, rPreds, rPoints, files, rStrs)
            val keptPaths = kept.map(f =>
              GraftFileSkipping.plainPath(f.filePath.toString)).toSet
            byBucket.filter(_.delegate.files.forall(f =>
              keptPaths.contains(GraftFileSkipping.plainPath(f.filePath.toString))))
              .toArray[InputPartition]
          }
        case None => byBucket.toArray[InputPartition]
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftUnwrapReaderFactory(inner.toBatch.createReaderFactory())
}

object GraftSpjScan {

  /** Bucket ids the runtime IN/= values over the bucketed DATA column
    * allow — shared by [[GraftSpjScan]] and [[GraftDvScan]]. None when
    * any predicate shape/type is unrecognized, or the spec's type has
    * no bucket function (pre-validation tables) — then nothing prunes;
    * pruning is sound because a file in bucket b holds ONLY values
    * hashing to b. */
  private[spark] def allowedBuckets(
      runtimePreds: Array[org.apache.spark.sql.connector.expressions.filter.Predicate],
      readSchema: StructType,
      bucketOf: Option[(String, Int)]): Option[Set[Int]] = bucketOf.flatMap {
    case (c, n) =>
      import org.apache.spark.sql.connector.expressions.{Literal => VLiteral,
        NamedReference}
      val colType = readSchema.fields
        .find(_.name.equalsIgnoreCase(c)).map(_.dataType)
        .getOrElse(return None)
      // a spec over a type the bucket function cannot hash (possible
      // only on tables written before the write-side validation) must
      // degrade to no-pruning, never crash the runtime re-plan
      if (!GraftBucketFunction.supports(colType)) return None
      val bucketer = new GraftBoundBucket(colType)
      val sets = runtimePreds.toSeq.map { p =>
        p.children().toSeq match {
          case Seq(ref: NamedReference, lits @ _*)
              if (p.name() == "IN" || p.name() == "=") &&
                ref.fieldNames.length == 1 &&
                ref.fieldNames.head.equalsIgnoreCase(c) && lits.nonEmpty &&
                lits.forall(_.isInstanceOf[VLiteral[_]]) =>
            val vs = lits.map(_.asInstanceOf[VLiteral[_]])
            if (vs.forall(l => l.dataType == colType && l.value != null))
              Some(vs.map(l => bucketer.produceResult(
                new GenericInternalRow(Array[Any](n, l.value))).toInt).toSet)
            else None
          case _ => None
        }
      }
      // conjunction: intersect the recognized predicates' bucket sets
      val known = sets.flatten
      if (known.isEmpty) None else Some(known.reduce(_ intersect _))
  }

  private val BucketDir =
    ("/" + java.util.regex.Pattern.quote(
      graft.storage.ParquetCatalog.BucketPartCol) + "=(\\d+)/").r

  /** Bucket id from a bucketed layout's file path — loud on anything
    * else (a bucket-declared table whose files lack the dir is a
    * corrupted layout; silently keying it 0 would mis-align a join). */
  private[spark] def bucketIdOf(path: String): Int =
    BucketDir.findFirstMatchIn(path).map(_.group(1).toInt).getOrElse(
      throw new IllegalStateException(
        s"bucketed table file carries no ${
          graft.storage.ParquetCatalog.BucketPartCol}=<id> component: $path"))
}

/** One stock file split plus the partition-value key Spark's
  * key-grouped exec aligns on. */
case class GraftKeyedPartition(delegate: FilePartition, key: InternalRow)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = key
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

/** Unwraps [[GraftKeyedPartition]] back to the stock split before
  * delegating — reads (row AND columnar) are the stock readers'. */
class GraftUnwrapReaderFactory(inner: PartitionReaderFactory)
  extends PartitionReaderFactory {

  private def unwrap(p: InputPartition): InputPartition = p match {
    case k: GraftKeyedPartition => k.delegate
    case other => other
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    inner.createReader(unwrap(p))

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    inner.createColumnarReader(unwrap(p))
}
