package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Edit-distance (Levenshtein) similarity join — entity resolution between a
 * dirty table and a clean master (typo'd product/customer names vs the
 * catalog), the record-linkage step every training-data metadata pipeline
 * eventually needs.
 *
 * Candidate generation is SYMMETRIC DELETION (the SymSpell scheme): every
 * string emits the hash of each variant reachable by deleting up to
 * `maxDist` characters (including itself). If ed(s,t) ≤ k, deleting the
 * ≤ k edited positions from each side yields a common variant, so two
 * strings within distance k ALWAYS share a signature — recall is exactly 1.
 * A shared signature only bounds ed ≤ 2k, so candidates are verified with
 * Spark's exact `levenshtein(l, r, threshold)` kernel (codegen'd banded DP
 * that exits early past the threshold).
 *
 * Scale posture: signatures are xxhash64 longs, never variant strings, so
 * the explode is (|s|·k)-wide but 8-bytes-a-row cheap; the candidate
 * shuffle keys on the signature with [[Dedup.sizeBandedBuckets]] capping
 * any hot signature (empty/boilerplate names); strings re-attach by id
 * equi-join AFTER the distinct candidate pairs, so no string ever rides
 * the signature shuffle (the ids-first pattern shared with the Jaccard
 * paths).
 */
object Fuzzy {

  /** Hashes of all deletion variants of `s` within `maxDist` deletions
    * (including `s` itself), distinct. maxDist ∈ {1, 2}. */
  private[graft] def deletionSigHashes(s: Column, maxDist: Int): Column = {
    require(maxDist == 1 || maxDist == 2, "maxDist must be 1 or 2")
    val n = length(s)
    // delete position i (1-based): s[1,i) ++ s(i,n]
    val del1 = transform(sequence(lit(1), n),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, n)))
    // delete positions i < j: s[1,i) ++ s(i,j) ++ s(j,n]
    val del2 = flatten(transform(sequence(lit(1), n - 1),
      i => transform(sequence(i + 1, n),
        j => concat(s.substr(lit(1), i - 1), s.substr(i + 1, j - i - 1),
          s.substr(j + 1, n)))))
    // sequence(1, 0) would step BACKWARDS, so guard short strings: length 0
    // has only itself; length 1 has itself + the empty string; del2 needs
    // length ≥ 2.
    val variants =
      when(n === 0, array(s))
        .when(n === 1, array(s, lit("")))
        .otherwise(if (maxDist == 1) concat(array(s), del1)
          else concat(array(s), del1, del2))
    transform(array_distinct(variants), v => xxhash64(v))
  }

  /**
   * All (left, right) pairs with Levenshtein distance ≤ `maxDist`, exact —
   * output columns (id_l, id_r, dist). For a self near-dup join pass the
   * same DataFrame twice and keep `id_l < id_r` afterwards.
   *
   * Distance depends only on the strings, so the signature/verify pipeline
   * runs over DISTINCT strings and the verified string pairs fan back out
   * to id pairs by two hash joins at the end. This makes the expensive part
   * immune to duplication: a catalog where one name appears 10⁸ times costs
   * one distinct-string row in the signature join (its 10⁸×10⁸ output pairs
   * exist either way — they ARE the answer — but no signature work scales
   * with them). Strings ride the candidate shuffle, which is fine at the
   * short-string sizes edit distance is for (names, titles, codes); for
   * document-length text use the Jaccard/MinHash family instead.
   *
   * Signatures over `maxBucketSize` DISTINCT-string members on either side
   * are dropped whole (a signature shared by that many distinct strings is
   * boilerplate-shaped; the cap bounds the per-signature pairing that would
   * otherwise go quadratic at 100 TB — recall trade documented here, exact
   * duplicates unaffected by construction).
   */
  def editDistanceJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftStr: String, rightId: String, rightStr: String,
      maxDist: Int = 1, maxBucketSize: Int = 1000): DataFrame =
    symDelJoin(left, right, leftId, leftStr, rightId, rightStr,
      maxDist, maxBucketSize,
      // 3-arg levenshtein: banded DP that returns -1 past the threshold —
      // O(k·min(|s|,|t|)) instead of O(|s|·|t|) per candidate
      (l, r) => levenshtein(l, r, maxDist) >= 0,
      (l, r) => Seq(levenshtein(l, r, maxDist).as("dist")))

  /** Shared candidate machinery: verified-distinct string pairs from the
    * symmetric-deletion signatures, fanned back out to id pairs. `score`
    * maps the (left, right) string columns to extra output columns.
    */
  private def symDelJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftStr: String, rightId: String, rightStr: String,
      maxDist: Int, maxBucketSize: Int,
      verify: (Column, Column) => Column,
      score: (Column, Column) => Seq[Column]): DataFrame = {
    val ls = left.select(col(leftId).as("id_l"), col(leftStr).as("__sl"))
    val rs = right.select(col(rightId).as("id_r"), col(rightStr).as("__sr"))
    def sigSide(ids: DataFrame, strCol: String) =
      Dedup.sizeBandedBuckets(
        ids.select(col(strCol)).distinct()
          .select(col(strCol),
            explode(deletionSigHashes(col(strCol), maxDist)).as("sig")),
        Seq("sig"), 1L, maxBucketSize)
    val candStr = sigSide(ls, "__sl").join(sigSide(rs, "__sr"), "sig")
      .select("__sl", "__sr").distinct()
      .filter(verify(col("__sl"), col("__sr")))
    candStr.join(ls, "__sl").join(rs, "__sr")
      .select(col("id_l") +: col("id_r") +: score(col("__sl"), col("__sr")): _*)
  }

  /**
   * Entity-resolution join ranked by Jaro-Winkler: candidates are the exact
   * Levenshtein ≤ `maxDist` pairs (symmetric-deletion recall = 1), scored
   * with the native [[graft.functions.JaroWinkler]] expression and kept at
   * `minSim` or above — the standard two-stage linkage shape (bounded-edit
   * candidate generation, JW ranking). Output (id_l, id_r, jw). JW itself
   * admits no complete blocking scheme (a high score does not bound any
   * signature distance), so the edit-distance envelope IS the recall
   * contract, and it is what makes the operator scale: candidate volume is
   * bounded by the deletion-signature buckets, never |L|×|R|.
   */
  def jaroWinklerJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftStr: String, rightId: String, rightStr: String,
      minSim: Double, maxDist: Int = 2,
      maxBucketSize: Int = 1000): DataFrame =
    symDelJoin(left, right, leftId, leftStr, rightId, rightStr,
      maxDist, maxBucketSize,
      (l, r) => levenshtein(l, r, maxDist) >= 0 &&
        graft.functions.NativeFuzzyKit.jaroWinkler(l, r) >= minSim,
      (l, r) => Seq(graft.functions.NativeFuzzyKit.jaroWinkler(l, r).as("jw")))

  /**
   * All (left, right) pairs with unrestricted Damerau-Levenshtein distance
   * ≤ `maxDist` — the typo metric where a swapped-char error ("hte") costs
   * 1. DL(s,t) ≤ k implies Levenshtein ≤ 2k (a transposition is two plain
   * edits), so deletion signatures at 2k keep recall exactly 1; candidates
   * are verified with the native [[graft.functions.DamerauLevenshtein]].
   * Output (id_l, id_r, dl). maxDist = 1 (signatures at 2).
   */
  def damerauJoin(left: DataFrame, right: DataFrame,
      leftId: String, leftStr: String, rightId: String, rightStr: String,
      maxBucketSize: Int = 1000): DataFrame =
    symDelJoin(left, right, leftId, leftStr, rightId, rightStr,
      maxDist = 2, maxBucketSize,
      (l, r) => graft.functions.NativeFuzzyKit.damerauLevenshtein(l, r) <= 1,
      (l, r) => Seq(graft.functions.NativeFuzzyKit.damerauLevenshtein(l, r)
        .cast("long").as("dl")))
}
