package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-probe for optimization rounds (same ad-hoc status as
  * PlanDump/JobProbe — not part of the bench contract). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      f; val t0 = System.nanoTime(); val n = f
      println(f"SCRATCH $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s ($n)")
    }
    val emb = graft.Tables.embeddings(spark, sfDir)
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SCRATCH $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s ($n)")
    }
    time("range_count") { spark.range(1000).count() }
    t("range_count_again") { spark.range(1000).count() }
    t("range_count_third") { spark.range(1000).count() }
    t("emb_count_1") { emb.count() }
    t("emb_count_2") { emb.count() }
    t("emb_count_3") { emb.count() }
    import graft.functions.VectorExpressions.dotF

    locally {
      val c = graft.Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_name"), substring(col("c_name"), 1, 16).as("blk"))
      val keyed = c.select(col("blk"), col("c_custkey").as("__id"), col("c_name").as("__nm"),
        explode(EditJoin.del1Keys(col("c_name"))).as("__k"))
      t("keyed_count") { keyed.count() }
      val a = keyed.select(col("blk"), col("__k"), col("__id").as("id_a"), col("__nm").as("name_a"))
      val b = keyed.select(col("blk"), col("__k"), col("__id").as("id_b"), col("__nm").as("name_b"))
      val raw = a.join(b, Seq("blk", "__k")).filter(col("id_a") < col("id_b"))
      t("raw_join_count") { raw.count() }
      t("cand_distinct_count") { raw.select("id_a","id_b","name_a","name_b").distinct().count() }
      t("key_bucket_max") {
        keyed.groupBy("blk","__k").count().agg(max("count")).as[Long](org.apache.spark.sql.Encoders.scalaLong).head()
      }
    }
    // 1. raw scan
    time("scan_count") { emb.count() }
    // 2. one dotF per row
    time("one_dot") {
      emb.select(dotF(col("embedding"), col("embedding")).as("d"))
        .agg(sum("d")).count()
    }
    // 3. 16 plane dots per row (the banding cost), via the same construction
    val planes = (0 until 16).map { p =>
      val w = (0 until 64).map { i =>
        val bit = Integer.parseInt(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$p|$i").substring(0, 1), 16) % 2
        if (bit == 1) 1.0f else -1.0f
      }
      typedlit(w)
    }
    time("16_plane_dots") {
      emb.select((0 until 16).map(p =>
        when(dotF(col("embedding"), planes(p)) >= 0, 1).otherwise(0).as(s"s$p")): _*)
        .agg(sum(expr((0 until 16).map(p => s"s$p").mkString("+"))))
        .count()
    }
    // 4. banding with explode(array(struct...)) like selfTopK
    val bandCols = (0 until 4).map { bd =>
      struct(lit(bd).as("band"),
        (0 until 4)
          .map(p => when(dotF(col("v"), planes(bd * 4 + p)) >= 0, 1).otherwise(0) * lit(1 << p))
          .reduce(_ + _).as("bucket"))
    }
    time("banded_explode") {
      emb.select(col("vec_id").as("id"), col("embedding").as("v"))
        .select(col("id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("id"), col("bk.band"), col("bk.bucket"))
        .agg(sum("bucket")).count()
    }
    // 4b. decompose window form
    locally {
      val base = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val bk = base.select(col("id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("id"), col("bk.band"), col("bk.bucket")).persist()
      t("bk_persist_build") { bk.count() }
      val sizes = bk.groupBy("band", "bucket").agg(count(lit(1)).as("__n"))
      t("sizes_agg") { sizes.count() }
      val tagged = bk.join(broadcast(sizes), Seq("band", "bucket"))
        .withColumn("sub", lit(0L))
      val cand = tagged.select(col("band"), col("bucket"), col("sub"), col("id").as("query_id"))
        .join(tagged.select(col("band"), col("bucket"), col("sub"), col("id").as("neighbor_id")),
          Seq("band", "bucket", "sub"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
      t("cand_distinct") { cand.count() }
      val vq = base.select(col("id").as("query_id"), col("v").as("qv"))
        .withColumn("qn", sqrt(dotF(col("qv"), col("qv"))))
      val vn = base.select(col("id").as("neighbor_id"), col("v").as("nv"))
        .withColumn("nn", sqrt(dotF(col("nv"), col("nv"))))
      val scored = cand.join(vq, "query_id").join(vn, "neighbor_id")
        .withColumn("sim", round(dotF(col("qv"), col("nv")) / col("qn") / col("nn"), 6))
      t("scored") { scored.count() }
      import org.apache.spark.sql.expressions.Window
      t("window_topk") {
        scored.withColumn("rank", row_number().over(
          Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
          .filter(col("rank") <= 5).count()
      }
      t("bounded_topk") {
        scored.groupBy("query_id")
          .agg(graft.functions.TopKAggregate.boundedTopK(col("sim"), col("neighbor_id"), 5).as("__top"))
          .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__e"))).count()
      }
      bk.unpersist()
    }
    // 5. full selfTopK window form
    time("selftopk_window") {
      Similarity.selfTopK(emb, "vec_id", "embedding", k = 5, dim = 64).count()
    }
    // 6. full selfTopK bounded form
    time("selftopk_bounded") {
      Similarity.selfTopK(emb, "vec_id", "embedding", k = 5, dim = 64,
        bounded = true).count()
    }
    spark.stop()
  }
}
