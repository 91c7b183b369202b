package graft.spark

import graft.functions.{BloomAgg, BloomContains, BoundedTopK, CmsEstimate, DotProductFloat, DotProductInt, MinHashSignature, SimHash64, TopicLangMatches}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session-extension registration (the SURVEY §7.3 (c)-tier mechanism):
  * makes the library's native Catalyst expressions available to pure-SQL
  * users. Activate at session build time with
  * `spark.sql.extensions=graft.spark.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`); for an already-running
  * session, `SqlBridge.registerFunction` installs the same builders.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** `dot_product_float(array<float>, array<float>) -> double` — the
    * codegen'd [[DotProductFloat]] as a SQL function. */
  val dotProductFloat: Registration =
    (FunctionIdentifier("dot_product_float"),
      new ExpressionInfo(classOf[DotProductFloat].getName,
        "dot_product_float"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"dot_product_float expects 2 arguments, got ${args.length}")
        DotProductFloat(args.head, args(1))
      })

  /** `minhash_sig(text[, num_hashes, shingle_k]) -> array<string>` —
    * the narrow no-shuffle [[MinHashSignature]]; the hash count and
    * shingle width must be literals (they parameterize codegen). */
  val minhashSig: Registration =
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(t) => MinHashSignature(t, 8, 3)
        case Seq(t, n, k) =>
          MinHashSignature(t, intLit(n, "num_hashes"), intLit(k, "shingle_k"))
        case _ => throw new IllegalArgumentException(
          s"minhash_sig expects 1 or 3 arguments, got ${args.length}")
      })

  /** `simhash64(text) -> bigint` — the narrow no-shuffle 64-bit
    * [[SimHash64]] over space-separated tokens. */
  val simhash64: Registration =
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"simhash64 expects 1 argument, got ${args.length}")
        SimHash64(args.head)
      })

  /** `topic_lang_matches(array<string>) -> array<string>` — the
    * reference-exact 23-entry substring dict scan over a topics array
    * ([[TopicLangMatches]], U1's hot per-row fold). */
  val topicLangMatches: Registration =
    (FunctionIdentifier("topic_lang_matches"),
      new ExpressionInfo(classOf[TopicLangMatches].getName,
        "topic_lang_matches"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"topic_lang_matches expects 1 argument, got ${args.length}")
        TopicLangMatches(args.head)
      })

  /** `dot_product_int(array<int>, array<int>) -> bigint` — the exact
    * integer fold for int8-quantized codes ([[DotProductInt]]). */
  val dotProductInt: Registration =
    (FunctionIdentifier("dot_product_int"),
      new ExpressionInfo(classOf[DotProductInt].getName, "dot_product_int"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"dot_product_int expects 2 arguments, got ${args.length}")
        DotProductInt(args.head, args(1))
      })

  /** `bounded_topk(score double, id bigint, k) -> array<struct>` — the
    * k-bounded-heap top-k aggregate ([[BoundedTopK]]); the analyzer
    * wraps the raw AggregateFunction in aggregate context. */
  val boundedTopK: Registration =
    (FunctionIdentifier("bounded_topk"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "bounded_topk"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"bounded_topk expects 3 arguments, got ${args.length}")
        BoundedTopK(args.head, args(1), intLit(args(2), "k"))
      })

  /** `bloom_agg(key bigint, num_bits, num_hashes) -> binary` — the
    * distributed Bloom-filter build ([[BloomAgg]]); sizes must be
    * literals (they fix the buffer layout). */
  val bloomAgg: Registration =
    (FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"bloom_agg expects 3 arguments, got ${args.length}")
        BloomAgg(args.head, intLit(args(1), "num_bits"),
          intLit(args(2), "num_hashes"))
      })

  /** `bloom_contains(bloom binary, key bigint) -> boolean` — the
    * codegen'd probe ([[BloomContains]]). */
  val bloomContains: Registration =
    (FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"bloom_contains expects 2 arguments, got ${args.length}")
        BloomContains(args.head, args(1))
      })

  /** `cms_estimate(sketch binary, key bigint) -> bigint` — probe for
    * the builtin `count_min_sketch` aggregate ([[CmsEstimate]]). */
  val cmsEstimate: Registration =
    (FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          s"cms_estimate expects 2 arguments, got ${args.length}")
        CmsEstimate(args.head, args(1))
      })

  /** `nearest_centroid(vec array<float>, cents array<array<float>>
    * [, return_dist]) -> int | double` — k-means argmin assignment
    * ([[graft.functions.NearestCentroid]]); the centroid matrix must be
    * foldable (it compiles into the generated code as a reference
    * object). */
  val nearestCentroid: Registration =
    (FunctionIdentifier("nearest_centroid"),
      new ExpressionInfo(
        classOf[graft.functions.NearestCentroid].getName, "nearest_centroid"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          s"nearest_centroid expects 2 or 3 arguments, got ${args.length}")
        require(args(1).foldable,
          "nearest_centroid centroids must be a literal array<array<float>>")
        val m = args(1).eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toObjectArray(args(1).dataType
                .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)
              .map {
                case row: org.apache.spark.sql.catalyst.util.ArrayData =>
                  row.toFloatArray()
                case other => throw new IllegalArgumentException(
                  s"centroid rows must be array<float>, got $other")
              }
          case other => throw new IllegalArgumentException(
            s"centroids must evaluate to an array, got $other")
        }
        val dist = args.length == 3 && (args(2) match {
          case Literal(b: Boolean, _) => b
          case other => throw new IllegalArgumentException(
            s"return_dist must be a boolean literal, got $other")
        })
        graft.functions.NearestCentroid(args.head, m, returnDist = dist)
      })

  /** `adc_lookup_sum(array<int>, array<double>, k) -> double` — the
    * codegen'd PQ ADC scoring sum ([[graft.functions.AdcLookupSum]]);
    * k (codes per subspace) must be a literal. */
  val adcLookupSum: Registration =
    (FunctionIdentifier("adc_lookup_sum"),
      new ExpressionInfo(
        classOf[graft.functions.AdcLookupSum].getName, "adc_lookup_sum"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          s"adc_lookup_sum expects 3 arguments, got ${args.length}")
        graft.functions.AdcLookupSum(args.head, args(1), intLit(args(2), "k"))
      })

  val all: Seq[Registration] =
    Seq(dotProductFloat, dotProductInt, minhashSig, simhash64,
      topicLangMatches, boundedTopK, bloomAgg, bloomContains, cmsEstimate,
      nearestCentroid, adcLookupSum)

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }
}
