package graft

import graft.operators.{SqlMerge, Upsert}
import org.apache.spark.sql.functions._

/** K4's literal API shape: the reference stages temp views and executes
  * a `MERGE INTO` statement string. These specs run the reference's
  * exact silver smart-merge statement text
  * (bronze_to_silver_transformation.py:874-918) through [[SqlMerge]]
  * and check the result row-by-row against an independent Scala
  * restatement of MERGE semantics, plus differential equality with
  * [[Upsert.merge]] where the two APIs overlap.
  */
class SqlMergeSpec extends SparkSpec {
  import spark.implicits._

  // verbatim statement text from the reference notebook (test INPUT —
  // this is the user-facing query surface the wrapper must accept)
  private val referenceMergeSql = """
        MERGE INTO github_curated AS target
        USING new_silver_data AS source
        ON target.repository_id = source.repository_id

        WHEN MATCHED THEN
          UPDATE SET
            name = source.name,
            full_name = source.full_name,
            description_clean = source.description_clean,
            updated_at = source.updated_at,
            pushed_at = source.pushed_at,
            stargazers_count = source.stargazers_count,
            watchers_count = source.watchers_count,
            forks_count = source.forks_count,
            open_issues_count = source.open_issues_count,
            star_velocity_30d = source.star_velocity_30d,
            community_health_score = source.community_health_score,
            quality_score = source.quality_score,
            topics_standardized = source.topics_standardized,
            license_category = source.license_category,
            is_active = source.is_active,
            days_since_push = source.days_since_push,
            days_since_creation = source.days_since_creation,
            processed_timestamp = source.processed_timestamp,

            -- Only update technology fields if current classification is poor
            technology_category = CASE
                WHEN target.technology_category = 'Other' OR target.technology_category IS NULL
                THEN source.technology_category
                ELSE target.technology_category
            END,
            technology_subcategory = CASE
                WHEN target.technology_subcategory = 'unknown' OR target.technology_subcategory IS NULL
                THEN source.technology_subcategory
                ELSE target.technology_subcategory
            END,
            classification_confidence = CASE
                WHEN target.technology_category = 'Other' OR target.technology_subcategory = 'unknown'
                THEN source.classification_confidence
                ELSE target.classification_confidence
            END

        WHEN NOT MATCHED THEN
          INSERT *
        """

  private val strCols = Seq("name", "full_name", "description_clean",
    "updated_at", "pushed_at", "topics_standardized", "license_category",
    "processed_timestamp")
  private val lngCols = Seq("stargazers_count", "watchers_count",
    "forks_count", "open_issues_count", "days_since_push",
    "days_since_creation")
  private val dblCols = Seq("star_velocity_30d", "community_health_score",
    "quality_score", "classification_confidence")

  /** A silver-shaped frame over `ids`, every column a deterministic
    * function of (id, tag) so target and source rows always differ. */
  private def silverFrame(ids: Seq[Long], tag: String) = {
    var df = ids.toDF("repository_id")
    for (c <- strCols)
      df = df.withColumn(c, concat(lit(s"$tag-$c-"), col("repository_id")))
    for (c <- lngCols)
      df = df.withColumn(c,
        col("repository_id") * lit(1 + lngCols.indexOf(c)) +
          lit(if (tag == "src") 1000L else 0L))
    for (c <- dblCols)
      df = df.withColumn(c,
        col("repository_id") * lit(0.5 + dblCols.indexOf(c)) +
          lit(if (tag == "src") 0.25 else 0.0))
    df.withColumn("is_active", col("repository_id") % 2 === lit(if (tag == "src") 0 else 1))
      .withColumn("technology_category",
        when(col("repository_id") % 3 === 0, "Other")
          .when(col("repository_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit(s"$tag-cat-"), col("repository_id"))))
      .withColumn("technology_subcategory",
        when(col("repository_id") % 4 === 0, "unknown")
          .otherwise(concat(lit(s"$tag-sub-"), col("repository_id"))))
  }

  test("the reference's silver MERGE statement parses structurally") {
    val p = SqlMerge.parse(referenceMergeSql)
    assert(p.targetTable === "github_curated" && p.targetAlias === "target")
    assert(p.sourceTable === "new_silver_data" && p.sourceAlias === "source")
    assert(p.onPairs === Seq("repository_id" -> "repository_id"))
    assert(p.insertAll)
    val set = p.updateSet.get.toMap
    assert(set.size === 21)
    assert(set("name") === "source.name")
    assert(set("technology_category").startsWith("CASE"))
  }

  test("the reference's silver MERGE statement runs with exact MERGE semantics") {
    val target = silverFrame(1L to 30L, "tgt")
    val source = silverFrame(16L to 45L, "src")
    target.createOrReplaceTempView("github_curated")
    source.createOrReplaceTempView("new_silver_data")
    val out = SqlMerge.run(spark, referenceMergeSql)
    assert(out.columns.toSeq === target.columns.toSeq)

    // independent row-wise restatement of the statement's semantics
    val cols = target.columns.toSeq
    def byId(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("repository_id") ->
        cols.map(c => c -> r.getAs[Any](c)).toMap).toMap
    val t = byId(target); val s = byId(source)
    val expected = (t.keySet ++ s.keySet).toSeq.map { id =>
      (t.get(id), s.get(id)) match {
        case (Some(tr), None) => tr
        case (None, Some(sr)) => sr
        case (Some(tr), Some(sr)) =>
          val keepCat = tr("technology_category") != "Other" &&
            tr("technology_category") != null
          val keepSub = tr("technology_subcategory") != "unknown" &&
            tr("technology_subcategory") != null
          val keepConf = tr("technology_category") != "Other" &&
            tr("technology_subcategory") != "unknown"
          cols.map { c =>
            c -> (c match {
              case "repository_id" => id
              case "technology_category" =>
                if (keepCat) tr(c) else sr(c)
              case "technology_subcategory" =>
                if (keepSub) tr(c) else sr(c)
              case "classification_confidence" =>
                if (keepConf) tr(c) else sr(c)
              case _ => sr(c)
            })
          }.toMap
        case _ => fail("unreachable")
      }
    }.toSet
    val got = byId(out).values.toSet
    assert(got === expected)
  }

  test("plain upsert MERGE text matches Upsert.merge when all columns update") {
    val target = Tables.orders(spark, "/root/testdata/sf0.001")
      .filter($"o_orderkey" % 4 =!= 0)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val source = Tables.orders(spark, "/root/testdata/sf0.001")
      .filter($"o_orderkey" % 2 === 0)
      .select($"o_orderkey", lit("U").as("o_orderstatus"),
        ($"o_totalprice" * 1.1).as("o_totalprice"))
    target.createOrReplaceTempView("sqlmerge_t")
    source.createOrReplaceTempView("sqlmerge_s")
    val viaSql = SqlMerge.run(spark, """
      MERGE INTO sqlmerge_t t USING sqlmerge_s s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET
        o_orderstatus = s.o_orderstatus,
        o_totalprice = s.o_totalprice
      WHEN NOT MATCHED THEN INSERT *""")
    val viaOp = Upsert.merge(target, source, Seq("o_orderkey"))
    assert(viaSql.exceptAll(viaOp).isEmpty && viaOp.exceptAll(viaSql).isEmpty)
  }

  test("MERGE without WHEN NOT MATCHED drops source-only rows") {
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("smt")
    Seq((2L, "B"), (3L, "C")).toDF("k", "v").createOrReplaceTempView("sms")
    val out = SqlMerge.run(spark,
      "MERGE INTO smt t USING sms s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v")
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "a"), (2L, "B")))
  }

  test("insert-only MERGE text keeps matched target rows untouched") {
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("imt")
    Seq((2L, "B"), (3L, "C")).toDF("k", "v").createOrReplaceTempView("ims")
    val out = SqlMerge.run(spark,
      "MERGE INTO imt t USING ims s ON t.k = s.k " +
        "WHEN NOT MATCHED THEN INSERT *")
      .as[(Long, String)].collect().toSet
    assert(out === Set((1L, "a"), (2L, "b"), (3L, "C")))
  }

  test("conditional matched clauses: first match wins, DELETE drops the row") {
    Seq((1L, "keep"), (2L, "del"), (3L, "upd"), (4L, "lone"))
      .toDF("k", "v").createOrReplaceTempView("cmt")
    Seq((2L, "DEL"), (3L, "NEW"), (5L, "INS"))
      .toDF("k", "v").createOrReplaceTempView("cms")
    val out = SqlMerge.run(spark, """
      MERGE INTO cmt t USING cms s ON t.k = s.k
      WHEN MATCHED AND t.v = 'del' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
      .as[(Long, String)].collect().toSet
    // 1: target-only kept; 2: matched+cond -> deleted; 3: matched,
    // first clause's cond false -> second clause updates; 4: target-only
    // kept; 5: source-only inserted
    assert(out === Set((1L, "keep"), (3L, "NEW"), (4L, "lone"), (5L, "INS")))
    // clause ORDER is semantic: update-first never reaches the delete
    val swapped = SqlMerge.run(spark, """
      MERGE INTO cmt t USING cms s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN MATCHED AND t.v = 'del' THEN DELETE
      WHEN NOT MATCHED THEN INSERT *""")
      .as[(Long, String)].collect().toSet
    assert(swapped === Set((1L, "keep"), (2L, "DEL"), (3L, "NEW"),
      (4L, "lone"), (5L, "INS")))
  }

  test("NULL keys never match: target kept, source inserted") {
    Seq((Option(1L), "t1"), (None, "tnull")).toDF("k", "v")
      .createOrReplaceTempView("nkt")
    Seq((Option(1L), "S1"), (None, "snull")).toDF("k", "v")
      .createOrReplaceTempView("nks")
    val out = SqlMerge.run(spark, """
      MERGE INTO nkt t USING nks s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
      .as[(Option[Long], String)].collect().toSet
    // the two NULL-keyed rows are strangers: target's kept, source's
    // inserted — exactly what the oracle's FULL OUTER ... ON = does
    assert(out === Set((Some(1L), "S1"), (None, "tnull"), (None, "snull")))
  }

  test("multiple source rows matching one target key raise, like Delta") {
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("dmt")
    Seq((1L, "B"), (1L, "C"), (2L, "D"), (2L, "E")).toDF("k", "v")
      .createOrReplaceTempView("dms")
    val sql = """
      MERGE INTO dmt t USING dms s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *"""
    intercept[IllegalStateException](SqlMerge.run(spark, sql))
    // unmatched duplicates (k=2) alone are legal — INSERT * takes both
    Seq((1L, "B"), (2L, "D"), (2L, "E")).toDF("k", "v")
      .createOrReplaceTempView("dms")
    assert(SqlMerge.run(spark, sql).as[(Long, String)].collect().toSet
      === Set((1L, "B"), (2L, "D"), (2L, "E")))
  }

  test("identifiers containing case/end/when words parse correctly") {
    Seq((1L, "x", "y", 10L)).toDF("k", "use_case", "week_end", "when_col")
      .createOrReplaceTempView("wct")
    Seq((1L, "X", "Y", 20L)).toDF("k", "use_case", "week_end", "when_col")
      .createOrReplaceTempView("wcs")
    val out = SqlMerge.run(spark, """
      MERGE INTO wct t USING wcs s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET
        use_case = s.use_case,
        week_end = CASE WHEN s.when_col > 15 THEN s.week_end
                        WHEN s.when_col > 5 THEN t.week_end
                        ELSE 'z' END,
        when_col = s.when_col
      WHEN NOT MATCHED THEN INSERT *""")
      .as[(Long, String, String, Long)].head()
    assert(out === ((1L, "X", "Y", 20L)))
  }

  test("unsupported clause shapes fail loudly") {
    intercept[IllegalArgumentException](SqlMerge.parse(
      "MERGE INTO t USING s ON t.k < s.k WHEN NOT MATCHED THEN INSERT *"))
    intercept[IllegalArgumentException](SqlMerge.parse(
      "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN TRUNCATE"))
    // column/value arity mismatch and re-keying updates fail at parse
    intercept[IllegalArgumentException](SqlMerge.parse(
      "MERGE INTO t USING s ON t.k = s.k " +
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k)"))
    intercept[IllegalArgumentException](SqlMerge.parse(
      "MERGE INTO t USING s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET k = s.k, v = s.v"))
  }

  test("INSERT (cols) VALUES: listed columns get their expressions, unlisted NULL") {
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "n")
      .createOrReplaceTempView("ivt")
    Seq((2L, "B", 200L), (3L, "C", 300L)).toDF("k", "v", "n")
      .createOrReplaceTempView("ivs")
    val out = SqlMerge.run(spark, """
      MERGE INTO ivt t USING ivs s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, upper(s.v))""")
      .as[(Long, String, Option[Long])].collect().toSet
    // 3 is inserted with the VALUES expressions; its unlisted n is NULL;
    // matched 2 updates v but keeps its n
    assert(out === Set((1L, "a", Some(10L)), (2L, "B", Some(20L)),
      (3L, "C", None)))
  }

  test("INSERT (cols) VALUES with a literal key never re-keys a NULL-keyed target row") {
    Seq((Option(1L), "t1"), (None, "tnull")).toDF("k", "v")
      .createOrReplaceTempView("lkt")
    Seq((Option(7L), "s7")).toDF("k", "v").createOrReplaceTempView("lks")
    val out = SqlMerge.run(spark, """
      MERGE INTO lkt t USING lks s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (99, s.v)""")
      .as[(Option[Long], String)].collect().toSet
    // the NULL-keyed target row keeps its NULL key; the source-only row
    // inserts under the literal key
    assert(out === Set((Some(1L), "t1"), (None, "tnull"), (Some(99L), "s7")))
  }

  test("string literals are opaque: comments, WHEN/CASE/END words, commas, spaces") {
    Seq((1L, "old", "x"), (2L, "keep", "y")).toDF("k", "v", "w")
      .createOrReplaceTempView("qlt")
    Seq((1L, "ignored", "z"), (5L, "src", "q")).toDF("k", "v", "w")
      .createOrReplaceTempView("qls")
    val out = SqlMerge.run(spark, """
      MERGE INTO qlt t USING qls s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET
        v = 'a -- not a comment',  -- a real comment
        w = 'WHEN CASE  END, two  spaces'
      WHEN NOT MATCHED THEN INSERT (k, v, w) VALUES (s.k, 'lit, with comma', s.w)""")
      .as[(Long, String, String)].collect().toSet
    assert(out === Set(
      (1L, "a -- not a comment", "WHEN CASE  END, two  spaces"),
      (2L, "keep", "y"),
      (5L, "lit, with comma", "q")))
  }
}
