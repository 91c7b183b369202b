package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's SQL `MERGE INTO` surface (SURVEY.md §2.2 K2–K4):
  * temp views are staged and a MERGE statement string is executed
  * (`bronze_to_silver_transformation.py:867-920`,
  * `github_data_ingestion.py:349-383`, `personal_repos_ingestion.py:
  * 303-336,417-433`). Without Delta, Spark cannot execute `MERGE INTO`
  * against parquet — so this wrapper accepts the statement *text*,
  * parses the skeleton (target/source/aliases/ON keys/WHEN clauses) at
  * regex level, hands every UPDATE SET right-hand side to Catalyst's
  * own expression parser, and runs [[Upsert]]-style full-outer-join
  * semantics. A reference notebook's MERGE string runs verbatim; the
  * caller writes the returned frame back (the reference's `spark.sql`
  * write-back is Delta's half of MERGE, not the semantics').
  *
  * Statement forms covered — exactly the reference's usage:
  *   - `WHEN MATCHED THEN UPDATE SET c = source.c, c2 = CASE ... END`
  *     (columns not listed KEEP the target value — note this differs
  *     from [[Upsert.merge]]'s update-everything default);
  *   - `WHEN NOT MATCHED THEN INSERT *`;
  *   - either clause may be absent: no-MATCHED = insert-only merge, no
  *     NOT-MATCHED = source-only rows are dropped (true MERGE
  *     semantics);
  *   - `ON target.k = source.k [AND ...]` composite equi-keys;
  *   - `--` comments anywhere (the reference statement has them).
  *
  * Execution shape is identical to [[Upsert.merge]]: ONE full-outer
  * shuffle join on the key columns; assignment expressions are Catalyst
  * expressions over the aliased join, inside whole-stage codegen.
  */
object SqlMerge {

  final case class ParsedMerge(
      targetTable: String, targetAlias: String,
      sourceTable: String, sourceAlias: String,
      onPairs: Seq[(String, String)],
      updateSet: Option[Seq[(String, String)]],
      insertAll: Boolean)

  private val headRe =
    ("(?i)^MERGE INTO (\\S+)(?: (?:AS )?(?!USING\\b)(\\w+))?" +
      " USING (\\S+)(?: (?:AS )?(?!ON\\b)(\\w+))? ON (.+?)( WHEN .+)$").r
  private val matchedRe =
    "(?is)WHEN MATCHED THEN UPDATE SET (.*?)(?= WHEN NOT MATCHED|$)".r
  private val notMatchedRe =
    "(?i)WHEN NOT MATCHED THEN INSERT \\*".r
  private val onPairRe =
    "(?i)^(\\w+)\\.(\\w+) ?= ?(\\w+)\\.(\\w+)$".r

  def parse(mergeSql: String): ParsedMerge = {
    val flat = mergeSql.replaceAll("--[^\n]*", " ")
      .replaceAll("\\s+", " ").trim.stripSuffix(";")
    val m = headRe.findFirstMatchIn(flat).getOrElse(
      throw new IllegalArgumentException(
        s"not a MERGE INTO ... USING ... ON ... WHEN ... statement: $flat"))
    val (tTab, tAl) = (m.group(1), Option(m.group(2)).getOrElse(m.group(1)))
    val (sTab, sAl) = (m.group(3), Option(m.group(4)).getOrElse(m.group(3)))
    val whenTail = m.group(6)

    val onPairs = splitTopLevel(m.group(5), "(?i) AND ").map(_.trim).map {
      case onPairRe(a, ak, b, bk) =>
        if (a.equalsIgnoreCase(tAl) && b.equalsIgnoreCase(sAl)) (ak, bk)
        else if (a.equalsIgnoreCase(sAl) && b.equalsIgnoreCase(tAl)) (bk, ak)
        else throw new IllegalArgumentException(
          s"ON term must equate a $tAl column with a $sAl column: $a.$ak = $b.$bk")
      case other => throw new IllegalArgumentException(
        s"unsupported ON term (equi-key only): $other")
    }

    val updateSet = matchedRe.findFirstMatchIn(whenTail).map { um =>
      splitAssignments(um.group(1).trim).map { a =>
        val eq = topLevelIndexOf(a, '=')
        require(eq > 0, s"malformed assignment: $a")
        val lhs = a.take(eq).trim
        val colName = lhs.split('.').last // strip optional target. prefix
        colName -> a.drop(eq + 1).trim
      }
    }
    val insertAll = notMatchedRe.findFirstIn(whenTail).isDefined
    // unsupported clause shapes must fail loudly, not silently drop or
    // keep rows (e.g. `WHEN MATCHED AND cond`, `INSERT (cols) VALUES`)
    require(updateSet.isDefined ||
      !"(?i)WHEN MATCHED".r.findFirstIn(whenTail).isDefined,
      s"unsupported WHEN MATCHED form (only `WHEN MATCHED THEN UPDATE SET ...`): $whenTail")
    require(insertAll ||
      !"(?i)WHEN NOT MATCHED".r.findFirstIn(whenTail).isDefined,
      s"unsupported WHEN NOT MATCHED form (only `INSERT *`): $whenTail")
    require(updateSet.isDefined || insertAll,
      "MERGE needs at least one WHEN clause (UPDATE SET or INSERT *)")
    ParsedMerge(tTab, tAl, sTab, sAl, onPairs, updateSet, insertAll)
  }

  /** Parse and execute `mergeSql` against the session catalog (the
    * reference's temp-view staging, K4: views registered with
    * `createOrReplaceTempView` resolve by name). Returns the merged
    * frame in target column order. */
  def run(spark: SparkSession, mergeSql: String): DataFrame = {
    val p = parse(mergeSql)
    execute(spark.table(p.targetTable), spark.table(p.sourceTable), p)
  }

  def execute(target: DataFrame, source: DataFrame, p: ParsedMerge): DataFrame = {
    val keyOf = p.onPairs.toMap
    if (p.insertAll) {
      val missing = target.columns.filterNot(c =>
        source.columns.exists(_.equalsIgnoreCase(c)))
      require(missing.isEmpty,
        s"INSERT * needs source to carry every target column; missing ${missing.mkString(",")}")
    }
    val t = target.withColumn("__t", lit(1)).alias(p.targetAlias)
    val s = source.withColumn("__s", lit(1)).alias(p.sourceAlias)
    val cond = p.onPairs.map { case (tk, sk) =>
      col(s"${p.targetAlias}.$tk") <=> col(s"${p.sourceAlias}.$sk")
    }.reduce(_ && _)
    val matched =
      col(s"${p.targetAlias}.__t").isNotNull &&
        col(s"${p.sourceAlias}.__s").isNotNull
    val sourceOnly = col(s"${p.targetAlias}.__t").isNull
    val assign = p.updateSet.getOrElse(Nil)
      .map { case (c, rhs) => c.toLowerCase -> rhs }.toMap
    val outCols = target.columns.toSeq.map { c =>
      val tc = col(s"${p.targetAlias}.$c")
      val sc = col(s"${p.sourceAlias}.$c")
      val out = keyOf.get(c) match {
        case Some(sk) => coalesce(tc, col(s"${p.sourceAlias}.$sk"))
        case None =>
          val onMatch = assign.get(c.toLowerCase).map(expr).getOrElse(tc)
          if (p.insertAll)
            when(matched, onMatch).when(sourceOnly, sc).otherwise(tc)
          else when(matched, onMatch).otherwise(tc)
      }
      out.as(c)
    }
    t.join(s, cond, "full_outer")
      .filter(if (p.insertAll) lit(true) else !sourceOnly)
      .select(outCols: _*)
  }

  /** Split on a regex separator, but only at paren depth 0. */
  private def splitTopLevel(s: String, sepRe: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    val sep = sepRe.r
    var i = 0
    while (i < s.length) {
      val rest = s.substring(i)
      val m = if (depth == 0) sep.findPrefixOf(rest) else None
      m match {
        case Some(tok) => parts += cur.toString; cur.clear(); i += tok.length
        case None =>
          val ch = s.charAt(i)
          if (ch == '(') depth += 1 else if (ch == ')') depth -= 1
          cur += ch; i += 1
      }
    }
    parts += cur.toString
    parts.toSeq
  }

  /** Split `a = x, b = CASE ... END, c = f(x, y)` on depth-0 commas —
    * commas inside function calls sit inside parens, which the depth
    * counter covers; CASE..END contains no bare commas. */
  private def splitAssignments(s: String): Seq[String] =
    splitTopLevel(s, ",").map(_.trim).filter(_.nonEmpty)

  private def topLevelIndexOf(s: String, ch: Char): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ch && depth == 0) return i
      i += 1
    }
    -1
  }
}
