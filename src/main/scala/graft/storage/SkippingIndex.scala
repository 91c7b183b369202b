package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** File-level min/max data-skipping index — the Delta/Iceberg stats-file
  * pattern (reference surface: the lakehouse scan tier of SURVEY.md
  * §2.1) over plain Parquet directories.
  *
  * Parquet already stores per-row-group column statistics in each file
  * FOOTER, so building the index reads metadata only — never data
  * pages. The footer reads are distributed (one Spark task per file
  * batch); what returns to the driver is index-sized (one row of
  * min/max per file·column), the same boundedness class as a probed
  * ANN list set. At 100 TB with ~1 GB files that is ~10⁵ tiny JSON
  * rows — driver-trivial — while the saved data scan is the whole
  * point: a range query over a [[ParquetCatalog.compact]]
  * `clusterBy`/`zorderBy` layout opens only the files whose [min,max]
  * intersects the predicate.
  *
  * `scan` prunes with the index, then re-applies the predicate — the
  * index is a file FILTER, never a truth source, so a stale index can
  * only over-read (and `write` is atomic via temp-file rename).
  */
object SkippingIndex {

  /** One file's stats for one column (values carried as strings with a
    * type tag so the JSON stays dependency-free). */
  final case class ColStats(column: String, typ: String, min: String, max: String,
      hasNulls: Boolean)
  final case class FileStats(file: String, rows: Long, cols: Seq[ColStats])

  private def statsFile(tableDir: String) =
    Paths.get(tableDir, "_graft_stats.json")

  /** Distributed footer read over every parquet file under `dir`. */
  def collect(spark: SparkSession, dir: String, cols: Seq[String]): Seq[FileStats] = {
    val files = listParquet(dir)
    val wanted = cols.toSet
    spark.sparkContext.parallelize(files, math.max(1, math.min(files.size, 32)))
      .map { f => readFooter(f, wanted) }
      .collect().toSeq.sortBy(_.file)
  }

  private def listParquet(dir: String): Seq[String] = {
    // resolve the real path: Files.walk does NOT traverse a symlink
    // root, and a versioned table's path IS a symlink (ParquetCatalog
    // time travel)
    val s = Files.walk(Paths.get(dir).toRealPath())
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(_.toString).toList.sorted
    finally s.close()
  }

  /** Footer-only stats for one file: per requested column, min of
    * row-group mins / max of row-group maxes. Runs inside a task. */
  private def readFooter(file: String, cols: Set[String]): FileStats = {
    val in = HadoopInputFile.fromPath(new HPath(file), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      val byCol = blocks.flatMap(_.getColumns.asScala)
        .filter(c => cols.contains(c.getPath.toDotString))
        .groupBy(_.getPath.toDotString)
      val stats = byCol.toSeq.sortBy(_._1).flatMap { case (name, chunks) =>
        val ss = chunks.map(_.getStatistics).filter(s =>
          s != null && s.hasNonNullValue)
        if (ss.isEmpty) None
        else {
          val typ = ss.head.`type`().getPrimitiveTypeName.name()
          // genericGetMin/Max are Comparable within one physical type
          val mins = ss.map(_.genericGetMin.asInstanceOf[Comparable[Any]])
          val maxs = ss.map(_.genericGetMax.asInstanceOf[Comparable[Any]])
          val mn = mins.reduce((a, b) => if (a.compareTo(b) <= 0) a else b)
          val mx = maxs.reduce((a, b) => if (a.compareTo(b) >= 0) a else b)
          val nulls = chunks.exists(c => c.getStatistics.getNumNulls > 0)
          Some(ColStats(name, typ, render(mn), render(mx), nulls))
        }
      }
      FileStats(file, rows, stats)
    } finally reader.close()
  }

  private def render(v: Any): String = v match {
    case b: org.apache.parquet.io.api.Binary => b.toStringUsingUTF8
    case other => other.toString
  }

  /** Build + atomically persist the index for `cols` of catalog table
    * `name` (or any parquet dir via `forDir`). */
  def write(spark: SparkSession, tableDir: String, cols: Seq[String]): Seq[FileStats] = {
    val stats = collect(spark, tableDir, cols)
    val json = statsToJson(stats)
    val tmp = Paths.get(tableDir, s"._graft_stats-${System.nanoTime()}.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, statsFile(tableDir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    stats
  }

  def read(tableDir: String): Seq[FileStats] = {
    require(Files.exists(statsFile(tableDir)),
      s"no skipping index at ${statsFile(tableDir)} — run SkippingIndex.write first")
    jsonToStats(Files.readString(statsFile(tableDir)))
  }

  /** Files whose [min,max] for `column` intersects [lo,hi] (numeric
    * compare for numeric physical types, lexicographic for BINARY).
    * Files with no stats for the column are conservatively KEPT. */
  def candidateFiles(tableDir: String, column: String, lo: Double, hi: Double): Seq[String] =
    candidateFilesAll(tableDir, Seq((column, lo, hi)))

  /** Numeric intersect test; non-numeric stats (BINARY/string columns)
    * conservatively KEEP the file — the index may only over-read,
    * never throw or wrongly prune. */
  private def overlaps(cs: ColStats, lo: Double, hi: Double): Boolean =
    try cs.max.toDouble >= lo && cs.min.toDouble <= hi
    catch { case _: NumberFormatException => true }

  /** Multi-column conjunctive pruning: a file survives only if EVERY
    * predicate's [lo,hi] intersects that column's [min,max]. Over a
    * [[ParquetCatalog.compact]] `zorderBy` layout each file is a
    * hypercube in bucket space, so every predicated dimension prunes —
    * the property a single-column lexicographic cluster only has for
    * its leading column (SkippingSpec measures the difference). */
  def candidateFilesAll(tableDir: String,
      preds: Seq[(String, Double, Double)]): Seq[String] = {
    read(tableDir).filter { fs =>
      preds.forall { case (column, lo, hi) =>
        fs.cols.find(_.column == column) match {
          case None => true
          case Some(cs) => overlaps(cs, lo, hi)
        }
      }
    }.map(_.file)
  }

  /** Index-pruned range scan: read only intersecting files, re-apply the
    * predicate (the index is advisory; correctness never depends on it).
    * Returns an empty frame with the table schema when nothing
    * intersects. */
  def scan(spark: SparkSession, tableDir: String, column: String,
      lo: Double, hi: Double): DataFrame =
    scanAll(spark, tableDir, Seq((column, lo, hi)))

  /** Conjunctive multi-predicate form of [[scan]]. */
  def scanAll(spark: SparkSession, tableDir: String,
      preds: Seq[(String, Double, Double)]): DataFrame = {
    require(preds.nonEmpty, "scanAll needs at least one predicate")
    val files = candidateFilesAll(tableDir, preds)
    val base =
      if (files.isEmpty)
        spark.read.parquet(tableDir).limit(0)
      else spark.read.parquet(files: _*)
    preds.foldLeft(base) { case (df, (column, lo, hi)) =>
      df.filter(col(column) >= lo && col(column) <= hi)
    }
  }

  // ---- dependency-free JSON (same discipline as graft.Verify) ----

  private def esc(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def statsToJson(stats: Seq[FileStats]): String =
    stats.map { fs =>
      val cols = fs.cols.map(c =>
        s"""{"column":${esc(c.column)},"typ":${esc(c.typ)},"min":${esc(c.min)},"max":${esc(c.max)},"hasNulls":${c.hasNulls}}""")
        .mkString("[", ",", "]")
      s"""{"file":${esc(fs.file)},"rows":${fs.rows},"cols":$cols}"""
    }.mkString("[\n", ",\n", "\n]")

  /** Minimal parser for exactly the JSON `statsToJson` emits. */
  private def jsonToStats(json: String): Seq[FileStats] = {
    // split objects at top level of the array by tracking depth/strings
    def splitObjects(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var depth = 0; var start = -1; var inStr = false; var escp = false
      s.zipWithIndex.foreach { case (ch, i) =>
        if (inStr) {
          if (escp) escp = false
          else if (ch == '\\') escp = true
          else if (ch == '"') inStr = false
        } else ch match {
          case '"' => inStr = true
          case '{' => depth += 1; if (depth == 1) start = i
          case '}' => depth -= 1; if (depth == 0) { out += s.substring(start, i + 1) }
          case _ =>
        }
      }
      out.result()
    }
    def field(obj: String, name: String): String = {
      val k = "\"" + name + "\":"
      val i = obj.indexOf(k)
      require(i >= 0, s"missing $name in $obj")
      val rest = obj.substring(i + k.length)
      if (rest.startsWith("\"")) {
        // string value with escapes
        val sb = new StringBuilder; var j = 1; var done = false
        while (!done) {
          rest.charAt(j) match {
            case '\\' =>
              rest.charAt(j + 1) match {
                case 'n' => sb += '\n'; case 'r' => sb += '\r'
                case 't' => sb += '\t'
                case 'u' =>
                  sb += Integer.parseInt(rest.substring(j + 2, j + 6), 16).toChar
                  j += 4
                case c => sb += c
              }
              j += 2
            case '"' => done = true
            case c => sb += c; j += 1
          }
        }
        sb.toString()
      } else rest.takeWhile(c => c != ',' && c != '}' && c != ']').trim
    }
    // file-level objects contain a nested "cols" array; isolate it first
    splitObjects(json).flatMap { outer =>
      // only top-level file objects have a "rows" field
      if (!outer.contains("\"rows\":")) None
      else {
        val colsStart = outer.indexOf("\"cols\":")
        val colsJson = outer.substring(colsStart)
        val cols = splitObjects(colsJson).map { c =>
          ColStats(field(c, "column"), field(c, "typ"),
            field(c, "min"), field(c, "max"), field(c, "hasNulls") == "true")
        }
        Some(FileStats(field(outer.substring(0, colsStart), "file"),
          field(outer.substring(0, colsStart), "rows").toLong, cols))
      }
    }
  }
}
