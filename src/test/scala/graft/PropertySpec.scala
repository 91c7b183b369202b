package graft

import graft.functions.Scores._
import graft.operators.{SkewJoin, Upsert}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5): invariants that must hold for any
  * input, driven through real Spark execution on generated frames.
  * (scalacheck generators sampled manually — the scalatest bridge
  * artifact is not in the offline cache.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("the V2 bucket function equals the write verb's pmod(hash(col), n) exactly") {
    // the soundness cornerstone of bucket SPJ and runtime bucket
    // pruning: Spark may EVALUATE GraftBoundBucket (push-part-values,
    // runtime IN mapping), and any divergence from the catalyst hash
    // the writer used would misroute rows. Property: for arbitrary
    // values and bucket counts, both paths agree — long, int, string.
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val ns = Gen.listOfN(6, Gen.chooseNum(1, 64)).sample.get
    val longs = Gen.listOfN(50,
      Gen.chooseNum(Long.MinValue, Long.MaxValue)).sample.get
    val ints = Gen.listOfN(50,
      Gen.chooseNum(Int.MinValue, Int.MaxValue)).sample.get
    val strs = Gen.listOfN(50, Gen.alphaNumStr).sample.get
    for (n <- ns) {
      val fL = new graft.spark.GraftBoundBucket(LongType)
      val sqlL = longs.toDF("v")
        .select(pmod(hash(col("v")), lit(n)).as("b")).as[Int].collect()
      val fnL = longs.map(v => fL.produceResult(
        new GenericInternalRow(Array[Any](n, v))).toInt)
      assert(sqlL.toSeq === fnL, s"long hash mismatch at n=$n")
      val fI = new graft.spark.GraftBoundBucket(IntegerType)
      val sqlI = ints.toDF("v")
        .select(pmod(hash(col("v")), lit(n)).as("b")).as[Int].collect()
      val fnI = ints.map(v => fI.produceResult(
        new GenericInternalRow(Array[Any](n, v))).toInt)
      assert(sqlI.toSeq === fnI, s"int hash mismatch at n=$n")
      val fS = new graft.spark.GraftBoundBucket(StringType)
      val sqlS = strs.toDF("v")
        .select(pmod(hash(col("v")), lit(n)).as("b")).as[Int].collect()
      val fnS = strs.map(v => fS.produceResult(new GenericInternalRow(
        Array[Any](n, org.apache.spark.unsafe.types.UTF8String.fromString(v))))
        .toInt)
      assert(sqlS.toSeq === fnS, s"string hash mismatch at n=$n")
    }
  }

  test("the V2 bucket function matches the write hash on date/timestamp/decimal/small types") {
    // r19: realistic non-long join keys — date-keyed dims, decimal
    // ids, timestamp keys — bucket through the SAME catalyst hash.
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.types.{BooleanType, ByteType, DateType,
      Decimal, DecimalType, ShortType, TimestampNTZType, TimestampType}
    val ns = Seq(1, 7, 16, 64)
    val days = Gen.listOfN(40, Gen.chooseNum(-100000, 100000)).sample.get
    val micros = Gen.listOfN(40,
      Gen.chooseNum(-3000000000000000L, 3000000000000000L)).sample.get
    val shorts = Gen.listOfN(40,
      Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt)).sample.get
      .map(_.toShort)
    val bytes = Gen.listOfN(40,
      Gen.chooseNum(Byte.MinValue.toInt, Byte.MaxValue.toInt)).sample.get
      .map(_.toByte)
    val decs = Gen.listOfN(40,
      Gen.chooseNum(-1000000000L, 1000000000L)).sample.get
      .map(v => BigDecimal(BigInt(v), 2))
    val wides = Gen.listOfN(40,
      Gen.chooseNum(-1000000000L, 1000000000L)).sample.get
      .map(v => BigDecimal(BigInt(v) * BigInt("1000000000000007"), 6))
    def fn(dt: org.apache.spark.sql.types.DataType, n: Int, v: Any): Int =
      new graft.spark.GraftBoundBucket(dt).produceResult(
        new GenericInternalRow(Array[Any](n, v))).toInt
    for (n <- ns) {
      val sqlD = days.toDF("v")
        .select(pmod(hash(expr("date_from_unix_date(v)")), lit(n)).as("b"))
        .as[Int].collect()
      assert(sqlD.toSeq === days.map(fn(DateType, n, _)),
        s"date hash mismatch at n=$n")
      val sqlT = micros.toDF("v")
        .select(pmod(hash(timestamp_micros(col("v"))), lit(n)).as("b"))
        .as[Int].collect()
      assert(sqlT.toSeq === micros.map(fn(TimestampType, n, _)),
        s"timestamp hash mismatch at n=$n")
      // NTZ micros hash through the identical long branch; pin one
      // real NTZ column round-trip for the binding itself
      assert(micros.map(fn(TimestampNTZType, n, _)) ===
        micros.map(fn(TimestampType, n, _)))
      val sqlNtz = Seq(java.time.LocalDateTime.of(2024, 3, 1, 12, 30, 15))
        .toDF("v").select(pmod(hash(col("v")), lit(n)).as("b")).as[Int].collect()
      val ntzMicros = org.apache.spark.sql.catalyst.util.DateTimeUtils
        .localDateTimeToMicros(java.time.LocalDateTime.of(2024, 3, 1, 12, 30, 15))
      assert(sqlNtz.head === fn(TimestampNTZType, n, ntzMicros))
      val sqlS = shorts.toDF("v")
        .select(pmod(hash(col("v")), lit(n)).as("b")).as[Int].collect()
      assert(sqlS.toSeq === shorts.map(fn(ShortType, n, _)))
      val sqlB = bytes.toDF("v")
        .select(pmod(hash(col("v")), lit(n)).as("b")).as[Int].collect()
      assert(sqlB.toSeq === bytes.map(fn(ByteType, n, _)))
      val sqlBool = Seq(true, false).toDF("v")
        .select(pmod(hash(col("v")), lit(n)).as("b")).as[Int].collect()
      assert(sqlBool.toSeq === Seq(true, false).map(fn(BooleanType, n, _)))
      // compact decimal (precision ≤ 18): hashed as the unscaled long
      val sqlDec = decs.toDF("v")
        .select(pmod(hash(col("v").cast(DecimalType(18, 2))), lit(n)).as("b"))
        .as[Int].collect()
      assert(sqlDec.toSeq === decs.map(d =>
        fn(DecimalType(18, 2), n, Decimal(d, 18, 2))),
        s"compact decimal hash mismatch at n=$n")
      // wide decimal (precision > 18): hashed as the unscaled bytes
      val sqlWide = wides.toDF("v")
        .select(pmod(hash(col("v").cast(DecimalType(38, 6))), lit(n)).as("b"))
        .as[Int].collect()
      assert(sqlWide.toSeq === wides.map(d =>
        fn(DecimalType(38, 6), n, Decimal(d, 38, 6))),
        s"wide decimal hash mismatch at n=$n")
    }
    // FLOAT/DOUBLE (±0.0/NaN hash traps) and anything else refuse to bind
    intercept[UnsupportedOperationException] {
      graft.spark.GraftBucketFunction.bind(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))))
    }
  }

  test("quality score is always within [0,100]") {
    val rows = Gen.listOfN(200, for {
      hd <- Gen.oneOf(true, false)
      nt <- Gen.chooseNum(-5, 50)
      st <- Gen.chooseNum(-100L, 1000000L)
      dp <- Gen.chooseNum(-10, 5000)
    } yield (hd, nt, st, dp)).sample.get
    val out = rows.toDF("hd", "nt", "st", "dp")
      .select(qualityScore($"hd", $"nt", $"st", $"dp").as("q"))
      .as[Int].collect()
    assert(out.forall(q => q >= 0 && q <= 100))
  }

  test("momentum score is always within [0,100] even for degenerate ages") {
    val rows = Gen.listOfN(200, for {
      stars <- Gen.chooseNum(0L, 10000000L)
      age <- Gen.chooseNum(-3, 10000)
    } yield (stars, age)).sample.get
    val out = rows.toDF("stars", "age")
      .select(momentumScore($"stars", $"age").as("m")).as[Double].collect()
    assert(out.forall(m => m >= 0.0 && m <= 100.0))
  }

  test("bloom filter: no false negatives for any key set, any sizing") {
    val cases = Gen.listOfN(20, for {
      nBits <- Gen.oneOf(1 << 10, 1 << 13, 1 << 16)
      nHash <- Gen.chooseNum(1, 8)
      keys <- Gen.listOfN(500, Gen.chooseNum(Long.MinValue, Long.MaxValue))
    } yield (nBits, nHash, keys)).sample.get
    for ((nBits, nHash, keys) <- cases) {
      val bf = graft.functions.BloomRuntime.alloc(nBits, nHash)
      keys.foreach(k => graft.functions.BloomRuntime.add(bf, k))
      assert(keys.forall(k => graft.functions.BloomRuntime.contains(bf, k)),
        s"false negative at bits=$nBits hashes=$nHash")
      // merge of a split build equals the single build, bit for bit
      val (l, r) = keys.splitAt(keys.length / 2)
      val b1 = graft.functions.BloomRuntime.alloc(nBits, nHash)
      val b2 = graft.functions.BloomRuntime.alloc(nBits, nHash)
      l.foreach(k => graft.functions.BloomRuntime.add(b1, k))
      r.foreach(k => graft.functions.BloomRuntime.add(b2, k))
      assert(java.util.Arrays.equals(
        graft.functions.BloomRuntime.merge(b1, b2), bf))
    }
  }

  test("nearest centroid: argmin matches a reference model, ties to lower index") {
    val cases = Gen.listOfN(50, for {
      k <- Gen.chooseNum(1, 6)
      dim <- Gen.chooseNum(1, 8)
      cents <- Gen.listOfN(k, Gen.listOfN(dim,
        Gen.chooseNum(-4, 4).map(_.toFloat)))
      v <- Gen.listOfN(dim, Gen.chooseNum(-4, 4).map(_.toFloat))
    } yield (cents.map(_.toArray).toArray, v.toArray)).sample.get
    for ((cents, v) <- cases) {
      val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v)
      val got = graft.functions.NearestCentroidRuntime.bestIndex(ad, cents)
      val dists = cents.map(c =>
        c.zip(v).map { case (a, b) =>
          (b.toDouble - a.toDouble) * (b.toDouble - a.toDouble) }.sum)
      val want = dists.zipWithIndex.minBy { case (dd, i) => (dd, i) }._2
      assert(got == want, s"argmin mismatch: $got vs $want (${dists.toSeq})")
      assert(graft.functions.NearestCentroidRuntime.bestDist(ad, cents)
        == dists.min)
    }
  }

  test("language distribution sums to ~100 (1dp rounding per entry)") {
    val topics = Gen.oneOf("python3", "golang", "spark", "web", "rusty",
      "docker", "bash-tools", "c++-lib", "typescript-starter", "ml")
    val rows = Gen.listOfN(100, for {
      p <- Gen.oneOf("Python", "Go", "", "null", "Rust")
      ts <- Gen.listOf(topics)
    } yield (p, ts)).sample.get
    val sums = rows.toDF("p", "ts")
      .select(aggregate(map_values(langDistribution($"p", $"ts")),
        lit(0.0), (a, x) => a + x).as("s"))
      .as[Double].collect()
    // each entry is rounded to 1dp AFTER normalization (reference
    // behavior), so the sum can drift by up to 0.05 per entry
    assert(sums.forall(s => math.abs(s - 100.0) <= 0.5), sums.mkString(","))
  }

  test("language distribution matches a direct port of the reference function") {
    // model: a literal Scala transcription of extract_language_distribution
    // (bronze_to_silver_transformation.py:403-445), evaluated driver-side
    def model(primary: String, topics: Seq[String]): Map[String, Double] = {
      val languages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val pValid = primary != null && primary.trim.nonEmpty &&
        !Seq("null", "none", "").contains(primary.toLowerCase)
      if (pValid) languages(primary) = 70.0
      val topicLangs = for {
        t <- topics; tl = t.toLowerCase
        (k, v) <- programmingLanguages if tl.contains(k)
      } yield v
      if (topicLangs.nonEmpty) {
        val per = (if (languages.nonEmpty) 30.0 else 100.0) / topicLangs.length
        topicLangs.foreach(l => if (!languages.contains(l)) languages(l) = per)
      }
      if (languages.isEmpty) languages("Unknown") = 100.0
      val total = languages.values.sum
      languages.map { case (k, v) =>
        k -> math.round(v / total * 100.0 * 10.0) / 10.0
      }.toMap
    }
    val primaries = Seq(null, "", "null", "NONE", "Python", "Go", "rust",
      "R", "Scala", "COBOL")
    val topicWords = Seq("python3", "golang", "spark", "kernel", "web", "ml",
      "typescript-starter", "c++-lib", "bash", "docker", "r", "data-sql",
      "julia-sets", "rusty", "php8", "none")
    val gen = for {
      p <- Gen.oneOf(primaries)
      ts <- Gen.listOf(Gen.oneOf(topicWords)).map(_.take(4))
    } yield (p, ts)
    val rows = Gen.listOfN(200, gen)
      .apply(Gen.Parameters.default, Seed(42L)).get
    val got = rows.zipWithIndex.map { case ((p, ts), i) => (i.toLong, p, ts) }
      .toDF("i", "p", "ts")
      .select($"i", langDistribution($"p", $"ts").as("m"))
      .select($"i", explode($"m").as(Seq("k", "v")))
      .as[(Long, String, Double)].collect()
      .groupBy(_._1).map { case (i, es) => i -> es.map(e => e._2 -> e._3).toMap }
    rows.zipWithIndex.foreach { case ((p, ts), i) =>
      assert(got(i.toLong) === model(p, ts), s"input ($p, $ts)")
    }
  }

  test("upsert idempotence: merge(merge(t,s),s) == merge(t,s) for random frames") {
    val keyGen = Gen.chooseNum(0L, 30L)
    val frameGen = Gen.listOfN(25, Gen.zip(keyGen, Gen.alphaStr, Gen.chooseNum(0, 999)))
    (1 to 5).foreach { i =>
      val t = frameGen.apply(Gen.Parameters.default, Seed(i.toLong * 2)).get
      val s = frameGen.apply(Gen.Parameters.default, Seed(i.toLong * 2 + 1)).get
      val td = t.distinctBy(_._1).toDF("id", "cat", "m")
      val sd = s.distinctBy(_._1).toDF("id", "cat", "m")
      val once = Upsert.merge(td, sd, Seq("id")).orderBy("id").collect()
      val twice = Upsert.merge(Upsert.merge(td, sd, Seq("id")), sd, Seq("id"))
        .orderBy("id").collect()
      assert(once === twice, s"iteration $i")
    }
  }

  test("ngram repetition expression matches an independent Scala model") {
    def model(text: String, n: Int): (Long, Long, Long) = {
      val toks = text.split(" ", -1)
      if (toks.length < n) (0L, 0L, 0L)
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toList
        val counts = grams.groupBy(identity).map { case (_, v) => v.size }
        (grams.size.toLong, counts.size.toLong, counts.max.toLong)
      }
    }
    // small vocab forces heavy gram collisions; include empty tokens
    // (consecutive spaces survive split(" ", -1) as "")
    val texts = Gen.listOfN(300,
      Gen.listOf(Gen.oneOf("a", "b", "c", "ab", "", "zz"))
        .map(_.mkString(" "))).sample.get
    val got = texts.toDF("text")
      .select(graft.functions.TextAnalysis.ngramRepetition($"text", 3).as("r"))
      .select($"r.n_grams", $"r.n_distinct", $"r.top_n")
      .as[(Long, Long, Long)].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g === model(t, 3), s"text '$t'")
    }
  }

  test("SqlMerge statement text is equivalent to Upsert.merge on random frames") {
    // randomized differential: the MERGE text surface and the
    // programmatic operator must agree wherever their contracts overlap
    // (non-null distinct keys; smart-case on one column, plain update
    // on the other)
    val gen = for {
      tKeys <- Gen.someOf(0L to 40L)
      sKeys <- Gen.someOf(0L to 40L)
      placeholders <- Gen.someOf(0L to 40L)
    } yield (tKeys.toSeq, sKeys.toSeq.distinct, placeholders.toSet)
    val scenarios = Gen.listOfN(8, gen).sample.get
    for (((tk, sk, ph), i) <- scenarios.zipWithIndex) {
      val target = tk.map(k => (k, if (ph(k)) "X" else s"t$k", s"ta$k"))
        .toDF("k", "cat", "a")
      val source = sk.map(k => (k, s"s$k", s"sa$k")).toDF("k", "cat", "a")
      target.createOrReplaceTempView(s"fz_t$i")
      source.createOrReplaceTempView(s"fz_s$i")
      val viaSql = graft.operators.SqlMerge.run(spark, s"""
        MERGE INTO fz_t$i AS target USING fz_s$i AS source
        ON target.k = source.k
        WHEN MATCHED THEN UPDATE SET
          a = source.a,
          cat = CASE WHEN target.cat = 'X' OR target.cat IS NULL
                     THEN source.cat ELSE target.cat END
        WHEN NOT MATCHED THEN INSERT *""")
        .as[(Long, String, String)].collect().toSet
      val viaOp = Upsert.merge(target, source, Seq("k"),
        smartCases = Map("cat" -> Upsert.keepUnlessPlaceholder("X")))
        .as[(Long, String, String)].collect().toSet
      assert(viaSql === viaOp, s"scenario $i: tk=$tk sk=$sk ph=$ph")
    }
  }

  test("salted join returns exactly the rows of the plain join") {
    // heavily skewed: 90% of big-side rows share one key
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, s"row$i")).toDF("k", "payload")
    val small = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = big.join(small, "k").orderBy("payload")
      .as[(Long, String, String)].collect()
    val salted = SkewJoin.saltedInnerJoin(big, small, "k",
      saltFactor = 8, discriminator = "payload").orderBy("payload")
      .as[(Long, String, String)].collect()
    assert(salted === plain)
  }

  test("pair_delta equals the brute-force pair-count difference on any strings") {
    // the incremental BPE trainer's entire exactness claim rests on this
    def pairs(t: String): Map[String, Long] = {
      val toks = t.trim.split(" ", -1)
      (0 until toks.length - 1).map(i => toks(i) + " " + toks(i + 1))
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    }
    val tokGen = Gen.oneOf("a", "b", "ab", "x'y", "q\\z", "\"w\"", "", " ")
    val strGen = Gen.listOfN(12, tokGen).map(_.mkString(" "))
    (1 to 40).foreach { i =>
      val before = strGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val after = strGen.apply(Gen.Parameters.default, Seed(i.toLong + 1000)).get
      val expected = (pairs(after).keySet ++ pairs(before).keySet).flatMap { p =>
        val d = pairs(after).getOrElse(p, 0L) - pairs(before).getOrElse(p, 0L)
        if (d != 0) Some(p -> d) else None
      }.toMap
      val got = Seq((before, after)).toDF("b", "a")
        .select(explode(graft.functions.PairDelta.pairDelta(col("b"), col("a"))).as("pw"))
        .select(col("pw.pair"), col("pw.n"))
        .as[(String, Long)].collect().toMap
      assert(got === expected, s"iteration $i: before='$before' after='$after'")
    }
  }

  test("evolveSchema: common columns merge identically; new/dropped columns obey nulls") {
    val keyGen = Gen.chooseNum(0L, 20L)
    val frameGen = Gen.listOfN(15, Gen.zip(keyGen, Gen.alphaStr, Gen.chooseNum(0, 99)))
    (1 to 5).foreach { i =>
      val t = frameGen.apply(Gen.Parameters.default, Seed(i * 31L)).get
        .distinctBy(_._1)
      val s = frameGen.apply(Gen.Parameters.default, Seed(i * 31L + 7)).get
        .distinctBy(_._1)
      val td = t.toDF("id", "cat", "m")
      // source drops cat, adds note
      val sd = s.toDF("id", "note", "m")
      val out = Upsert.merge(td, sd, Seq("id"), evolveSchema = true)
        .orderBy("id").collect()
      assert(out.head.schema.fieldNames.toSeq === Seq("id", "cat", "m", "note"))
      val tKeys = t.map(_._1).toSet
      val sKeys = s.map(_._1).toSet
      // union of keys, exactly once each
      assert(out.map(_.getAs[Long]("id")).toSeq === (tKeys ++ sKeys).toSeq.sorted)
      out.foreach { r =>
        val id = r.getAs[Long]("id")
        // dropped column survives for target rows, null for inserted
        assert((r.getAs[String]("cat") == null) === !tKeys.contains(id))
        // new column carried wherever the source touched the row
        assert((r.getAs[String]("note") == null) === !sKeys.contains(id))
        // common column resolves exactly like a plain merge: source wins
        val expM = s.find(_._1 == id).map(_._3).getOrElse(t.find(_._1 == id).get._3)
        assert(r.getAs[Int]("m") === expM)
      }
    }
  }

  test("morton key round-trips: de-interleaving recovers the clamped buckets") {
    val g = Gen.zip(Gen.chooseNum(-10, 300), Gen.chooseNum(-10, 300))
    (1 to 100).foreach { i =>
      val (x, y) = g.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val bits = 1 + i % 8
      val mask = (1 << bits) - 1
      val z = graft.functions.ZOrder.mortonKey(bits, x, y)
      def extract(c: Int): Int =
        (0 until bits).map(b => (((z >> (b * 2 + c)) & 1L) << b).toInt).sum
      assert(extract(0) === math.min(math.max(x, 0), mask))
      assert(extract(1) === math.min(math.max(y, 0), mask))
    }
  }

  test("candidate planning matches a reference model on random indexes") {
    // the r20 O(caller's-files) planner must be semantically identical
    // to the specification: per conjunct, a file with matching-type
    // stats drops only when [min,max] misses [lo,hi]; unindexed files,
    // absent stats, unparseable (NaN) bounds, lossy string tags, and
    // nullKeep-flagged files all conservatively keep.
    import graft.storage.SkippingIndex
    import graft.storage.SkippingIndex.{ColStats, FileStats}
    for (round <- 0 until 25) {
      val rnd = new scala.util.Random(4242 + round)
      val n = 1 + rnd.nextInt(40)
      val stats = (0 until n).map { i =>
        val cols = Seq.newBuilder[ColStats]
        if (rnd.nextInt(4) > 0) {
          val a = rnd.nextInt(1000) - 500; val b = a + rnd.nextInt(200)
          cols += ColStats("x", "INT64", a.toString, b.toString,
            rnd.nextBoolean(), rnd.nextInt(3) - 1L)
        }
        if (rnd.nextInt(4) > 0) {
          val p = f"k${rnd.nextInt(900)}%03d"; val q = f"k${rnd.nextInt(900)}%03d"
          val (l, h) = if (p <= q) (p, q) else (q, p)
          val tag = if (rnd.nextInt(5) == 0) "BINARY:STRING(lossy)"
            else "BINARY:STRING"
          cols += ColStats("s", tag, l, h, rnd.nextBoolean(), -1L)
        }
        FileStats(s"/t/f$i.parquet", 10L, cols.result())
      }
      val dir = java.nio.file.Files.createTempDirectory("prop-skip")
      val sp = dir.resolve("_graft_stats.json")
      SkippingIndex.persistStats(sp, stats)
      val live = (stats.map(_.file).filter(_ => rnd.nextBoolean()) ++
        Seq.fill(rnd.nextInt(3))(s"/t/unknown${rnd.nextInt(100)}.parquet"))
        .distinct
      val preds =
        if (rnd.nextBoolean()) {
          val lo = rnd.nextInt(1000) - 500
          Seq(("x", lo.toDouble, (lo + rnd.nextInt(300)).toDouble,
            Set.empty[String]))
        } else Nil
      val strPreds =
        if (rnd.nextBoolean()) {
          val p = f"k${rnd.nextInt(900)}%03d"; val q = f"k${rnd.nextInt(900)}%03d"
          val (l, h) = if (p <= q) (p, q) else (q, p)
          Seq(("s", Some(l), Some(h)))
        } else Nil
      val keepNulls = if (rnd.nextInt(4) == 0) Some("x") else None
      val got = SkippingIndex.candidateFilesTyped(sp, live, preds,
        keepNulls, strPreds)
      // straight-from-the-spec reference model
      val byFile = stats.map(fs => fs.file -> fs).toMap
      val genHasNullCol =
        keepNulls.forall(c => stats.exists(_.cols.exists(_.column == c)))
      def refKeep(f: String): Boolean = byFile.get(f) match {
        case None => true
        case Some(fs) =>
          if (!genHasNullCol) true // keepNullsOf column never indexed
          else {
            val nullSkip = keepNulls.exists(c =>
              fs.cols.find(_.column == c).forall(_.hasNulls))
            if (nullSkip) true
            else {
              val numOk = preds.forall { case (c, lo, hi, raw) =>
                fs.cols.find(_.column == c).forall { cs =>
                  val numeric = cs.typ match {
                    case "INT32" | "INT64" | "FLOAT" | "DOUBLE" => true
                    case t => t.startsWith("INT32:INT") ||
                      t.startsWith("INT64:INT")
                  }
                  if (!(numeric || raw.contains(cs.typ))) true
                  else {
                    val mn = cs.min.toDoubleOption.getOrElse(Double.NaN)
                    val mx = cs.max.toDoubleOption.getOrElse(Double.NaN)
                    !(mx < lo || mn > hi)
                  }
                }
              }
              val strOk = strPreds.forall { case (c, lo, hi) =>
                fs.cols.find(_.column == c).forall { cs =>
                  if (cs.typ != "BINARY:STRING") true
                  else {
                    val below = lo.exists(b => cs.max < b)
                    val above = hi.exists(b => cs.min > b)
                    !(below || above)
                  }
                }
              }
              numOk && strOk
            }
          }
      }
      val want = live.filter(refKeep).sorted
      assert(got === want,
        s"round=$round preds=$preds strPreds=$strPreds nulls=$keepNulls")
    }
  }
}
