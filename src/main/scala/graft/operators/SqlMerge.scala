package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's SQL `MERGE INTO` surface (SURVEY.md §2.2 K2–K4):
  * temp views are staged and a MERGE statement string is executed
  * (`bronze_to_silver_transformation.py:867-920`,
  * `github_data_ingestion.py:349-383`, `personal_repos_ingestion.py:
  * 303-336,417-433`). Without Delta, Spark cannot execute `MERGE INTO`
  * against parquet — so this wrapper accepts the statement *text*,
  * parses the skeleton (target/source/aliases/ON keys/WHEN clauses) at
  * regex level, hands every condition and UPDATE SET right-hand side to
  * Catalyst's own expression parser, and runs [[Upsert]]-style
  * full-outer-join semantics. A reference notebook's MERGE string runs
  * verbatim; the caller writes the returned frame back (the reference's
  * `spark.sql` write-back is Delta's half of MERGE, not the
  * semantics').
  *
  * Statement forms covered — the full Delta-style action surface:
  *   - any number of ordered `WHEN MATCHED [AND <cond>] THEN
  *     UPDATE SET c = source.c, c2 = CASE ... END | DELETE` clauses —
  *     the FIRST clause whose condition holds applies; matched rows
  *     hitting no clause (or columns not listed in the applied SET)
  *     keep the target value — note this differs from
  *     [[Upsert.merge]]'s update-everything default;
  *   - `WHEN NOT MATCHED THEN INSERT *` or `INSERT (cols) VALUES
  *     (exprs)` (unlisted columns NULL, Delta semantics); absent →
  *     source-only rows are dropped (true MERGE semantics);
  *   - `ON target.k = source.k [AND ...]` composite equi-keys;
  *   - `--` comments anywhere (the reference statement has them);
  *   - CASE..END expressions in conditions and assignments (the clause
  *     split is CASE-aware — a CASE's own WHENs are not clause
  *     boundaries);
  *   - string literals are opaque to the skeleton parser: quoted
  *     `--`, WHEN/CASE/END words, commas and runs of spaces inside
  *     `'...'` survive comment-stripping and clause/assignment splits.
  *
  * Execution shape is identical to [[Upsert.merge]]: ONE full-outer
  * shuffle join on the key columns; conditions and assignments are
  * Catalyst expressions over the aliased join, inside whole-stage
  * codegen.
  */
object SqlMerge {

  sealed trait MatchedAction { def cond: Option[String] }
  final case class UpdateAction(cond: Option[String],
      set: Seq[(String, String)]) extends MatchedAction
  final case class DeleteAction(cond: Option[String]) extends MatchedAction

  final case class ParsedMerge(
      targetTable: String, targetAlias: String,
      sourceTable: String, sourceAlias: String,
      onPairs: Seq[(String, String)],
      matchedActions: Seq[MatchedAction],
      insertAll: Boolean,
      insertValues: Option[Seq[(String, String)]] = None) {
    /** First UPDATE clause's assignments (the common single-clause
      * case). */
    def updateSet: Option[Seq[(String, String)]] =
      matchedActions.collectFirst { case UpdateAction(_, s) => s }
    def hasInsert: Boolean = insertAll || insertValues.isDefined
  }

  private val headRe =
    ("(?i)^MERGE INTO (\\S+)(?: (?:AS )?(?!USING\\b)(\\w+))?" +
      " USING (\\S+)(?: (?:AS )?(?!ON\\b)(\\w+))? ON (.+?) WHEN (.+)$").r
  private val updRe =
    "(?is)^MATCHED(?: AND (.+?))? THEN UPDATE SET (.+)$".r
  private val delRe =
    "(?is)^MATCHED(?: AND (.+?))? THEN DELETE$".r
  private val insRe =
    "(?i)^NOT MATCHED THEN INSERT \\*$".r
  private val insColsRe =
    "(?is)^NOT MATCHED THEN INSERT \\((.+?)\\) VALUES \\((.+)\\)$".r
  private val onPairRe =
    "(?i)^(\\w+)\\.(\\w+) ?= ?(\\w+)\\.(\\w+)$".r

  def parse(mergeSql: String): ParsedMerge = {
    val flat = normalize(mergeSql)
    val m = headRe.findFirstMatchIn(flat).getOrElse(
      throw new IllegalArgumentException(
        s"not a MERGE INTO ... USING ... ON ... WHEN ... statement: $flat"))
    val (tTab, tAl) = (m.group(1), Option(m.group(2)).getOrElse(m.group(1)))
    val (sTab, sAl) = (m.group(3), Option(m.group(4)).getOrElse(m.group(3)))

    val onPairs = splitTopLevel(m.group(5), "(?i) AND ").map(_.trim).map {
      case onPairRe(a, ak, b, bk) =>
        if (a.equalsIgnoreCase(tAl) && b.equalsIgnoreCase(sAl)) (ak, bk)
        else if (a.equalsIgnoreCase(sAl) && b.equalsIgnoreCase(tAl)) (bk, ak)
        else throw new IllegalArgumentException(
          s"ON term must equate a $tAl column with a $sAl column: $a.$ak = $b.$bk")
      case other => throw new IllegalArgumentException(
        s"unsupported ON term (equi-key only): $other")
    }

    // ordered WHEN clauses: split the tail on WHEN tokens that sit at
    // paren depth 0 AND outside any CASE..END (a CASE's own WHENs are
    // part of an assignment expression, not clause boundaries)
    val clauses = splitClauses(m.group(6)).map(_.trim)
    var insertAll = false
    var insertValues: Option[Seq[(String, String)]] = None
    val matched = clauses.flatMap {
      case updRe(cond, set) =>
        Some(UpdateAction(Option(cond).map(_.trim),
          splitAssignments(set.trim).map { a =>
            val eq = topLevelIndexOf(a, '=')
            require(eq > 0, s"malformed assignment: $a")
            a.take(eq).trim.split('.').last -> a.drop(eq + 1).trim
          }))
      case delRe(cond) => Some(DeleteAction(Option(cond).map(_.trim)))
      case c if insRe.findFirstIn(c).isDefined => insertAll = true; None
      case insColsRe(cols, vals) =>
        val cs = splitAssignments(cols).map(_.trim.split('.').last)
        val vs = splitAssignments(vals)
        require(cs.length == vs.length,
          s"INSERT column/value count mismatch: ${cs.length} vs ${vs.length}")
        require(cs.map(_.toLowerCase).distinct.length == cs.length,
          s"INSERT lists a column twice: ${cs.mkString(",")}")
        insertValues = Some(cs.zip(vs))
        None
      case other => throw new IllegalArgumentException(
        "unsupported WHEN clause (UPDATE SET / DELETE / INSERT * / " +
          s"INSERT (cols) VALUES (...) only): WHEN $other")
    }
    require(matched.nonEmpty || insertAll || insertValues.isDefined,
      "MERGE needs at least one WHEN clause")
    require(!(insertAll && insertValues.isDefined),
      "MERGE cannot combine INSERT * with INSERT (cols) VALUES")
    // Delta applies UPDATE SET on an ON-key column, silently breaking
    // the join contract downstream; this engine's convention is to fail
    // loudly on shapes whose semantics would surprise (ADVICE r4)
    val keyLc = onPairs.map(_._1.toLowerCase).toSet
    matched.foreach {
      case UpdateAction(_, set) => set.foreach { case (c, _) =>
        require(!keyLc(c.toLowerCase),
          s"UPDATE SET must not assign ON key column '$c' — re-keying a " +
            "matched row is not a merge; update it as a delete + insert")
      }
      case _ => ()
    }
    ParsedMerge(tTab, tAl, sTab, sAl, onPairs, matched, insertAll, insertValues)
  }

  /** Parse and execute `mergeSql` against the session catalog (the
    * reference's temp-view staging, K4: views registered with
    * `createOrReplaceTempView` resolve by name). Returns the merged
    * frame in target column order. */
  def run(spark: SparkSession, mergeSql: String,
      checkSourceMultiplicity: Boolean = true): DataFrame = {
    val p = parse(mergeSql)
    execute(spark.table(p.targetTable), spark.table(p.sourceTable), p,
      checkSourceMultiplicity)
  }

  def execute(target: DataFrame, source: DataFrame, p: ParsedMerge,
      checkSourceMultiplicity: Boolean = true): DataFrame = {
    val keyOf = p.onPairs.toMap
    if (p.insertAll) {
      val missing = target.columns.filterNot(c =>
        source.columns.exists(_.equalsIgnoreCase(c)))
      require(missing.isEmpty,
        s"INSERT * needs source to carry every target column; missing ${missing.mkString(",")}")
    }
    // Delta's MERGE raises on a target row matched by MULTIPLE source
    // rows (silent nondeterministic duplication otherwise); mirror that
    // with one semi-join + aggregate pre-check. Source keys that match
    // nothing may repeat freely — INSERT * legally inserts them all.
    if (checkSourceMultiplicity && p.matchedActions.nonEmpty) {
      val sKeys = p.onPairs.map(_._2)
      val tAsS = target.select(p.onPairs.map { case (tk, sk) =>
        col(tk).as(sk)
      }: _*)
      val dup = source.select(sKeys.map(col): _*)
        .join(tAsS, sKeys, "left_semi")
        .groupBy(sKeys.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).limit(1).collect()
      if (dup.nonEmpty) throw new IllegalStateException(
        "MERGE: multiple source rows match the same target key " +
          s"(${sKeys.mkString(",")} = ${dup.head.toSeq.init.mkString(",")}) — " +
          "deduplicate the source, or pass checkSourceMultiplicity = false")
    }
    val t = target.withColumn("__t", lit(1)).alias(p.targetAlias)
    val s = source.withColumn("__s", lit(1)).alias(p.sourceAlias)
    // plain equality, NOT null-safe: SQL MERGE never matches NULL keys
    // (a NULL-keyed target row is kept as-is, a NULL-keyed source row
    // is an insert) — k7's oracle joins with = for the same reason
    val cond = p.onPairs.map { case (tk, sk) =>
      col(s"${p.targetAlias}.$tk") === col(s"${p.sourceAlias}.$sk")
    }.reduce(_ && _)
    val matched =
      col(s"${p.targetAlias}.__t").isNotNull &&
        col(s"${p.sourceAlias}.__s").isNotNull
    val sourceOnly = col(s"${p.targetAlias}.__t").isNull

    // first matching clause index under `matched`, -1 = no clause hits
    val actionIdx = p.matchedActions.zipWithIndex
      .foldRight(lit(-1): Column) { case ((a, i), els) =>
        when(a.cond.map(expr).getOrElse(lit(true)), lit(i)).otherwise(els)
      }
    val act = when(matched, actionIdx).otherwise(lit(-1))
    val deleteIdx = p.matchedActions.zipWithIndex
      .collect { case (_: DeleteAction, i) => i }
    val updates = p.matchedActions.zipWithIndex
      .collect { case (u: UpdateAction, i) =>
        i -> u.set.map { case (c, rhs) => c.toLowerCase -> rhs }.toMap
      }

    // value a source-only row inserts for target column c: INSERT * →
    // the same-named source column (ON keys via their mapped source
    // key); INSERT (cols) VALUES → the listed expression, NULL for
    // unlisted columns (Delta semantics); no insert clause → None
    val insertMap = p.insertValues.map(_.map { case (c, e) =>
      c.toLowerCase -> e
    }.toMap)
    def insertValueFor(c: String): Option[Column] =
      if (p.insertAll)
        Some(keyOf.get(c).map(sk => col(s"${p.sourceAlias}.$sk"))
          .getOrElse(col(s"${p.sourceAlias}.$c")))
      else insertMap.map(m => m.get(c.toLowerCase).map(expr)
        .getOrElse(lit(null).cast(target.schema(c).dataType)))

    val outCols = target.columns.toSeq.map { c =>
      val tc = col(s"${p.targetAlias}.$c")
      val out = keyOf.get(c) match {
        // sourceOnly-gated, not coalesce: a NULL-keyed target row (kept
        // as-is per MERGE semantics) must keep its NULL key even when
        // the insert expression is a non-null literal
        case Some(_) => insertValueFor(c) match {
          case Some(iv) => when(sourceOnly, iv).otherwise(tc)
          case None => tc
        }
        case None =>
          val onMatch = updates.foldRight(tc) { case ((i, set), els) =>
            when(col("__act") === i,
              set.get(c.toLowerCase).map(expr).getOrElse(tc)).otherwise(els)
          }
          insertValueFor(c) match {
            case Some(iv) =>
              when(matched, onMatch).when(sourceOnly, iv).otherwise(tc)
            case None => when(matched, onMatch).otherwise(tc)
          }
      }
      out.as(c)
    }
    val joined = t.join(s, cond, "full_outer").withColumn("__act", act)
    val kept = deleteIdx.foldLeft(
      if (p.hasInsert) joined else joined.filter(!sourceOnly)) {
      (df, i) => df.filter(col("__act") =!= i)
    }
    kept.select(outCols: _*)
  }

  /** Pre-scan: strip `--` comments and collapse whitespace — but leave
    * single-quoted literal content untouched (the r4 scanners comment-
    * stripped and whitespace-collapsed INSIDE literals, truncating a
    * quoted '--' and mangling multi-space literals). `''` is the SQL
    * quote escape: the scanner momentarily closes and reopens, which
    * keeps the region opaque either way. */
  private def normalize(sql: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    var lastWs = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inQ) {
        sb += c
        if (c == '\'') inQ = false
        i += 1
      } else if (c == '\'') {
        sb += c; inQ = true; lastWs = false; i += 1
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
      } else if (c.isWhitespace) {
        if (!lastWs && sb.nonEmpty) { sb += ' '; lastWs = true }
        i += 1
      } else {
        sb += c; lastWs = false; i += 1
      }
    }
    sb.toString.trim.stripSuffix(";")
  }

  /** Split the WHEN-clause tail at `WHEN` word tokens that are at
    * paren depth 0, not inside a CASE..END expression, and not inside
    * a string literal. */
  private def splitClauses(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var paren = 0
    var caseDepth = 0
    var inQ = false
    var i = 0
    // '_' is a word character in SQL identifiers — week_end / use_case
    // must not register as END/CASE tokens
    def wordChar(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    def wordAt(w: String): Boolean =
      s.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !wordChar(s.charAt(i - 1))) &&
        (i + w.length >= s.length || !wordChar(s.charAt(i + w.length)))
    while (i < s.length) {
      val ch = s.charAt(i)
      if (inQ) {
        if (ch == '\'') inQ = false
        cur += ch; i += 1
      } else if (ch == '\'') {
        inQ = true; cur += ch; i += 1
      } else {
        if (ch == '(') paren += 1 else if (ch == ')') paren -= 1
        if (paren == 0 && wordAt("CASE")) {
          caseDepth += 1; cur ++= s.substring(i, i + 4); i += 4
        } else if (paren == 0 && caseDepth > 0 && wordAt("END")) {
          caseDepth -= 1; cur ++= s.substring(i, i + 3); i += 3
        } else if (paren == 0 && caseDepth == 0 && wordAt("WHEN")) {
          parts += cur.toString; cur.clear(); i += 4
        } else {
          cur += ch; i += 1
        }
      }
    }
    parts += cur.toString
    parts.filter(_.trim.nonEmpty).toSeq
  }

  /** Split on a regex separator, but only at paren depth 0 and outside
    * string literals. (Shared with [[graft.storage.CatalogSql]]'s
    * UPDATE SET/WHERE boundary detection.) */
  private[graft] def splitTopLevel(s: String, sepRe: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQ = false
    val sep = sepRe.r
    var i = 0
    while (i < s.length) {
      val rest = s.substring(i)
      val m = if (depth == 0 && !inQ) sep.findPrefixOf(rest) else None
      m match {
        case Some(tok) => parts += cur.toString; cur.clear(); i += tok.length
        case None =>
          val ch = s.charAt(i)
          if (inQ) { if (ch == '\'') inQ = false }
          else if (ch == '\'') inQ = true
          else if (ch == '(') depth += 1
          else if (ch == ')') depth -= 1
          cur += ch; i += 1
      }
    }
    parts += cur.toString
    parts.toSeq
  }

  /** Split `a = x, b = CASE ... END, c = f(x, y)` on depth-0 commas —
    * commas inside function calls sit inside parens, which the depth
    * counter covers; CASE..END contains no bare commas. (Shared with
    * [[graft.storage.CatalogSql]]'s UPDATE statement parsing.) */
  private[graft] def splitAssignments(s: String): Seq[String] =
    splitTopLevel(s, ",").map(_.trim).filter(_.nonEmpty)

  private[graft] def topLevelIndexOf(s: String, ch: Char): Int = {
    var depth = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ch && depth == 0) return i
      i += 1
    }
    -1
  }
}
