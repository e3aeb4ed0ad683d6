package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column kit for training-data pipelines: tokenization, char
 * n-grams, language-ID heuristic, quality scoring, fingerprinting. All pure
 * `Column` expressions (whole-stage-codegen'd) — at 100 TB the text scan is
 * the bottleneck, so nothing here leaves the codegen path except the
 * explicitly-registered Catalyst expression in [[Fingerprint]].
 */
object TextKit {

  /** Whitespace tokens; empty/blank input → empty array (size 0, not [""]).
    */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Non-empty trimmed lines of a document ('\n'-delimited); blank and
    * whitespace-only lines are dropped.
    */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /**
   * Intra-document repetition statistics — the Gopher/RefinedWeb-style
   * quality signals a training-data pipeline filters on (Rae et al. 2021,
   * Table A1): documents dominated by repeated lines or words are
   * boilerplate/spam, not prose. Returns a struct of
   *   - `n_lines`, `dup_line_frac`     (repeated-line fraction),
   *     `dup_line_char_frac`           (chars in repeat occurrences of a
   *                                     line / total line chars),
   *   - `n_words`, `dup_word_frac`     (repeated-word fraction),
   *     `top_word_frac`                (most frequent word's share).
   * Empty inputs yield 0 fractions.
   *
   * Pure codegen'd expression; the per-word occurrence count is O(W·D) in
   * (words × distinct words) per document, which is the right trade below
   * ~10³ words/doc (no shuffle, no explode). For book-length documents use
   * an explode + groupBy formulation instead — the stats are per-document,
   * so the aggregate is one hash-shuffle on doc id.
   */
  def repetitionStats(text: Column): Column = {
    val ls = lines(text)
    val dls = array_distinct(ls)
    val ws = tokens(text)
    val dws = array_distinct(ws)
    def charSum(a: Column): Column =
      aggregate(a, lit(0L), (acc, x) => acc + length(x))
    val nl = size(ls).cast("double")
    val nw = size(ws).cast("double")
    val lchars = charSum(ls).cast("double")
    struct(
      size(ls).cast("long").as("n_lines"),
      when(nl > 0, (nl - size(dls).cast("double")) / nl).otherwise(0.0)
        .as("dup_line_frac"),
      when(lchars > 0, (lchars - charSum(dls).cast("double")) / lchars)
        .otherwise(0.0).as("dup_line_char_frac"),
      size(ws).cast("long").as("n_words"),
      when(nw > 0, (nw - size(dws).cast("double")) / nw).otherwise(0.0)
        .as("dup_word_frac"),
      when(nw > 0,
        array_max(transform(dws, w => size(filter(ws, x => x === w))))
          .cast("double") / nw).otherwise(0.0).as("top_word_frac"))
  }

  /** BPE-ish subword count: word-piece regex — runs of letters, digits, or
    * single non-space symbols (a cheap stand-in for a real BPE vocab; the
    * shape — regex extract-all count — is what a tokenizer-count pipeline
    * looks like at scale).
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Character n-grams in input order (with repeats): text shorter than n →
    * empty array. Built with transform(sequence) so it stays in codegen.
    */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))

  /** Distinct n-gram set of a text (the Jaccard input). For pairwise work,
    * compute this ONCE per document per side *before* the pair join:
    * Catalyst pushes pair filters into join conditions, where expressions
    * are interpreted per probed row with no subexpression elimination — a
    * from-raw-text Jaccard there rebuilds both shingle arrays ~6× per pair
    * (measured 10× slower than the precomputed-set shape at sf0.1).
    */
  def ngramSet(text: Column, n: Int): Column =
    array_distinct(charNgrams(text, n))

  /** Distinct n-gram set as sorted 64-bit hashes — the pairwise-join form.
    * Same Jaccard as [[ngramSet]] up to 64-bit collisions (P(any collision
    * among k shingles) ≈ k²/2⁶⁵ ≈ 10⁻¹³ at k=10³), with ~8× less heap and
    * shuffle than UTF8 shingle arrays and cheap long equality in
    * `array_intersect`. At 100 TB the pair-verify shuffle carries these
    * arrays — bytes per shingle is the scaling term.
    */
  def ngramHashSet(text: Column, n: Int): Column =
    // native single-pass sketch ([[graft.functions.NgramHashSet]]): no
    // per-shingle substring allocation, primitive sort+dedup; hash choice
    // is internal (consumers use the hashes for equality/distinctness
    // only, and the oracles count STRING n-grams)
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.NgramHashSet(
        org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** Directional containment ppm over two SORTED long arrays (the
    * [[ngramHashSet]] output invariant) with early exit below `minPpm`
    * (returns -1 there) — the verify-stage kernel of
    * [[graft.ops.Dedup.containmentPairs]]; see
    * [[graft.functions.SortedContainmentPpm]]. */
  def sortedContainmentPpm(a: Column, b: Column, minPpm: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.SortedContainmentPpm(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b), minPpm))

  /** The Unicode scripts [[scriptProfile]] counts, name → Java regex
    * character class. BMP-safe (counts are UTF-16 units, and every class
    * here lives in the BMP); extend with surrogate-aware classes if a
    * supplementary-plane script is ever routed on. */
  val scriptClasses: Seq[(String, String)] = Seq(
    "arabic" -> "\\p{IsArabic}",
    "cyrillic" -> "\\p{IsCyrillic}",
    "greek" -> "\\p{IsGreek}",
    "han" -> "\\p{IsHan}",
    "latin" -> "\\p{IsLatin}",
    "digits" -> "\\p{Nd}")

  /** Per-script character counts + the dominant script (most characters,
    * ties by name) — the multilingual corpus-routing signal that decides
    * which language-ID / tokenizer family a document goes to. Pure
    * codegen'd regexp counting, zero shuffle; "none" when no counted
    * class occurs. */
  def scriptProfile(text: Column): Column = {
    val counts = scriptClasses.map { case (name, cls) =>
      name -> length(regexp_replace(text, s"[^$cls]", "")).cast("long")
    }
    val ranked = array_sort(
      array(counts.map { case (n, c) =>
        struct(c.as("n"), lit(n).as("s")) }: _*),
      (l, r) => when(l.getField("n") > r.getField("n"), -1)
        .when(l.getField("n") < r.getField("n"), 1)
        .otherwise(when(l.getField("s") < r.getField("s"), -1)
          .when(l.getField("s") > r.getField("s"), 1).otherwise(0)))
    val top = element_at(ranked, 1)
    struct((counts.map { case (n, c) => c.as(n) } :+
      when(top.getField("n") > 0L, top.getField("s")).otherwise(lit("none"))
        .as("dominant")): _*)
  }

  /** Deflate compression ratio in ppm — the too-compressible/too-random
    * corpus-quality signal; see [[graft.functions.DeflateRatioPpm]]. */
  def compressionRatioPpm(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.DeflateRatioPpm(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Pushdown barrier for expensive pair filters:
    * `filter(noPushdown(expensive >= θ))` keeps `expensive` in the
    * codegen'd post-join stage instead of letting predicate pushdown
    * inline its full tree into the join condition (interpreted, evaluated
    * per probed row, before distinct). The barrier must WRAP the predicate
    * ([[OpaqueValue]]) — in Spark 4 neither `rand() >= 0` (range-folded to
    * a literal) nor a nondeterministic sibling conjunct (pushdown now
    * splits conjunctions with `partition(_.deterministic)`, not `span`)
    * blocks anything.
    */
  def noPushdown(cond: Column): Column = BarrierKit.opaque(cond)

  /** Jaccard from two precomputed distinct n-gram sets. Empty-vs-empty is
    * DEFINED as 0.0 (not the 0/0 indeterminate): two sub-n-length texts
    * share no shingle evidence, so they are not near-dups — and the DuckDB
    * oracles guard the same case explicitly, keeping both engines off the
    * NaN/NULL divergence (ADVICE r2).
    */
  def jaccardFromSets(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = (size(sa) + size(sb)).cast("double") - inter
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** n-gram Jaccard similarity of two texts as distinct-set overlap.
    * Prefer ngramSet + jaccardFromSets around joins (see [[ngramSet]]).
    */
  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    jaccardFromSets(ngramSet(a, n), ngramSet(b, n))

  /** Stopword-marker counts per language — a tiny n-gram/stopword
    * language-ID heuristic. Counts are whole-word regex matches.
    */
  private val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is)\\b",
    "es" -> "\\b(el|la|de|que|y)\\b",
    "fr" -> "\\b(le|la|de|et|les)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "zh" -> "\\b(zh|shi|de|le|bu)\\b")

  /** Language-ID: argmax of marker-hit counts, ties broken by fixed
    * language order, no hits → "und". Deterministic and cross-engine
    * reproducible (same regexes run in the DuckDB oracle).
    */
  def langId(text: Column): Column = {
    val scored = langMarkers.map { case (lang, re) =>
      (lang, size(regexp_extract_all(text, lit(re), lit(0))))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // Earliest language in langMarkers order wins ties (build the when
    // chain outside-in so the head of the list is the outermost branch).
    scored.reverse.foldLeft(lit("und")) { case (els, (lang, cnt)) =>
      when(cnt === best && best > 0, lit(lang)).otherwise(els)
    }
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0)))

  /** English stopword hits (quality-scoring feature). */
  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\b(the|a|an|and|or|of|to|in|is|it)\\b"), lit(0)))

  /** Document quality score in [0,1]: blend of length band, punctuation
    * ratio and stopword ratio — the standard cheap pre-filter shape for
    * LLM corpus cleaning. Returned as a double; quantize with
    * [[Kit.bps]] for cross-engine compares.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val toks = greatest(tokenCount(text).cast("double"), lit(1.0))
    val lengthScore =
      least(nChars / lit(200.0), lit(1.0)) // 200+ chars = full marks
    val stopRatio = least(stopwordCount(text).cast("double") / toks, lit(1.0))
    val punctRatio = least(punctCount(text).cast("double") / toks, lit(1.0))
    // weights: 0.5 length + 0.3 stopwords + 0.2 (1 - excessive punct)
    lengthScore * 0.5 + stopRatio * 0.3 + (lit(1.0) - punctRatio) * 0.2
  }

  /** 32-bit polynomial rolling-hash fingerprint (codegen'd Catalyst
    * expression — see [[graft.functions.Fingerprint32]]).
    */
  def fingerprint32(text: Column): Column = Fingerprint.fingerprint32(text)

  // ── PII redaction ─────────────────────────────────────────────────────
  // Patterns are deliberately restricted to constructs with identical
  // semantics in Java regex and RE2 (character classes, bounded repetition,
  // \b ASCII word boundaries; no backreferences or lookaround) so the same
  // pattern runs verbatim in the DuckDB oracle. The IPv4 pattern accepts
  // out-of-range octets like 999 — standard for scrubbing (over-redaction
  // of a non-address is harmless; under-redaction is not).
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern: String = "\\+\\d{1,3}[ .-]\\d{3}[ .-]\\d{3}[ .-]\\d{4}"

  /** Count of PII matches of one pattern (taken on the ORIGINAL text —
    * counts then redaction, never the reverse, so counts are stable
    * regardless of replacement-token collisions).
    */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact emails, then phone numbers, then IPv4 addresses with typed
    * placeholder tokens. Email runs first (its local part may embed digit
    * runs a later pass would chew on); phone before IPv4 (dotted phone
    * separators could otherwise present IPv4-shaped substrings). Pure
    * chained `regexp_replace` — codegen'd, zero shuffle, scan-speed at
    * 100 TB like every scrubber must be.
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, lit(emailPattern), lit("<EMAIL>"))
    val p = regexp_replace(e, lit(phonePattern), lit("<PHONE>"))
    regexp_replace(p, lit(ipv4Pattern), lit("<IP>"))
  }

  /**
   * HTML → text extraction (the WET-style step that turns crawled markup
   * into the plain text every downstream text operator consumes): drop
   * `<script>`/`<style>` blocks wholesale (their CONTENT is code, not
   * prose), drop comments, strip remaining tags, decode the five standard
   * named entities plus `&#39;`, and collapse whitespace. Every pattern is
   * RE2-portable (no backreferences — script and style are separate
   * passes, the price of staying portable) and the entity chain decodes
   * `&amp;` LAST, so `&amp;lt;` correctly yields the literal `&lt;`.
   * Pure chained regexp/replace expressions — codegen'd, zero shuffle,
   * scan-speed at 100 TB, where this runs on every crawled byte.
   */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ")
      .foldLeft(noTags) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }
    val amp = replace(named, lit("&amp;"), lit("&"))
    trim(regexp_replace(amp, "\\s+", " "))
  }
}
