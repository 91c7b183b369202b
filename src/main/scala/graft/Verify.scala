package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // ABSOLUTE inventory pin: the live query pack must equal the
    // committed inventory file, name for name. The relative gates below
    // (failed-count, emitted-vs-selected) can't see a pack edit that
    // silently drops queries — both sides would shrink together. This
    // one can: deleting OR adding a query without updating the committed
    // list is a hard exit 1 with the diff printed. tools/check.py pins
    // the same file against the emitted result dirs.
    val inventory = {
      val in = getClass.getResourceAsStream("/graft/inventory.txt")
      require(in != null, "missing committed inventory resource graft/inventory.txt")
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
    val live = SparkEntry.queries.keySet
    if (live != inventory) {
      val missing = (inventory -- live).toSeq.sorted
      val extra = (live -- inventory).toSeq.sorted
      System.err.println(
        s"[verify] INVENTORY MISMATCH: pack has ${live.size}, committed " +
          s"inventory has ${inventory.size}" +
          (if (missing.nonEmpty) s"; dropped from pack: ${missing.mkString(",")}" else "") +
          (if (extra.nonEmpty) s"; not in inventory: ${extra.mkString(",")}" else ""))
      sys.exit(1)
    }
    // Local-iteration filter (comma-separated names); the driver never
    // sets it, so the gate always runs the full inventory.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    var failed = List.empty[String]
    var emitted = 0
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        emitted += 1
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed ::= name
      }
      spark.catalog.clearCache() // drop per-query persisted frames
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Un-shrinkable gate: any query failure, or an emitted count below the
    // declared inventory, is a hard non-zero exit — a silently smaller
    // output dir can never look green to the driver again.
    if (failed.nonEmpty) {
      System.err.println(s"[verify] ${failed.size} quer${if (failed.size == 1) "y" else "ies"} FAILED: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    }
    if (emitted != selected.size) {
      System.err.println(s"[verify] emitted $emitted of ${selected.size} selected queries")
      sys.exit(1)
    }
    println(s"[verify] OK: $emitted/${SparkEntry.queries.size} queries emitted")
  }
}
