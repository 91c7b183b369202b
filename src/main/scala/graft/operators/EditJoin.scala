package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Candidate generation for edit-distance-≤1 self-joins via single-
  * deletion neighborhoods (the FastSS / symmetric-delete family,
  * Bocek et al. 2007): each string emits `len + 1` keys — itself plus
  * every single-character deletion. Two strings within Levenshtein
  * distance 1 ALWAYS share a key:
  *
  *   - equal strings share the string itself;
  *   - a substitution at position i: deleting position i from both
  *     sides yields the same string;
  *   - an insertion/deletion: the shorter string IS a deletion key of
  *     the longer one, and every string's key set contains itself.
  *
  * The key join can also pair strings at distance 2 (e.g. transposed
  * neighbors), so the caller MUST re-verify with the exact (bounded)
  * `levenshtein` — the candidate set is a strict superset of the
  * ≤1 pairs and the verified output is identical to the quadratic
  * within-block join it replaces.
  *
  * Why: a prefix block over near-identical keys (the j11/er1 shape —
  * and the NORMAL shape for entity keys like "Customer#000000042",
  * which share long constant prefixes) degenerates to one giant block,
  * and the within-block join goes O(n²·len) in a single partition. The
  * deletion-neighborhood join is O(n·len) keys and the bucket sizes are
  * bounded by true near-duplicate multiplicity, so it parallelizes and
  * survives 100× — the same candidate-bounding move as MinHash bands
  * (Dedup.lshCandidatePairs) and hyperplane bands
  * (Similarity.nearDupPairsBanded), specialised to edit distance.
  */
object EditJoin {

  /** `name` plus every single-character deletion of it, as one array
    * column (≤ `len + 1` entries; a 0-length string emits just itself),
    * de-duplicated — deleting any character of a run (e.g. the zero-run
    * in "Customer#000000001") yields the SAME key, and duplicate keys
    * on both join sides would multiply each matching pair by the run
    * length squared before the distinct. Codegen'd
    * ([[graft.functions.Del1Keys]]): the declarative transform/substr
    * form paid an interpreted lambda per emitted key on the hot explode. */
  private[operators] def del1Keys(name: Column): Column =
    graft.functions.EditKeyFunctions.del1Keys(name)

  /** Candidate pairs (id_a < id_b, names attached) whose edit distance
    * MAY be ≤ 1, within equal `blockCol` groups — a strict superset of
    * the true ≤1 pairs of the within-block self-join; verify with
    * `levenshtein(name_a, name_b, 1)` to get the identical result. */
  def candidatesLev1(df: DataFrame, blockCol: String, idCol: String,
      nameCol: String): DataFrame = {
    // join key = ONE hash long over (block, deletion key): the join
    // only needs to DECIDE collisions — hash collisions add false
    // candidates the exact verify removes, never drop true ones within
    // a (block, key) bucket (guide §2.3: shuffle keys, not payloads).
    // persisted: both self-join sides read the exploded key frame, and
    // callers verify over the same columns — built once per query.
    // null name or block: the quadratic form drops the row too (null
    // keys never equi-join; null names fail the levenshtein filter)
    val keyed = df.select(col(blockCol).as("__blk"), col(idCol).as("__id"),
        col(nameCol).as("__nm"), explode(del1Keys(col(nameCol))).as("__k"))
      .filter(col("__blk").isNotNull)
      .select(xxhash64(col("__blk"), col("__k")).as("__h"),
        col("__id"), col("__nm"))
      .persist()
    val a = keyed.select(col("__h"), col("__id").as("id_a"), col("__nm").as("name_a"))
    val b = keyed.select(col("__h"), col("__id").as("id_b"), col("__nm").as("name_b"))
    a.join(b, Seq("__h"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "name_a", "name_b")
      .distinct()
  }
}
