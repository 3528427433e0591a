package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline layer
  * (BASELINE.json north star): token counting, quality scoring, language
  * identification, document fingerprinting.
  *
  * All are pure `org.apache.spark.sql.functions` compositions — codegen'd,
  * no UDFs — so they stay inside whole-stage codegen and scale linearly
  * with no shuffle (per-row map work over 100 TB of documents is the ideal
  * Spark workload: scan-bound, partition-parallel).
  */
object TextFunctions {

  /** PII patterns for redaction — deliberately RE2-safe (no backrefs or
    * lookaround) so the same pattern text runs identically under Java
    * regex (Spark) and RE2 (DuckDB oracle). Order matters downstream:
    * emails first (they contain dots and digits), then IPs, then phones. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe = "\\+?[0-9][0-9 -]{6,}[0-9]"

  /** Redact emails / IPv4s / phone-like digit runs to typed placeholder
    * tokens — the standard PII scrub before a corpus ships to training.
    * Pure codegen'd regexp_replace chain: scan-bound at 100 TB. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** How many PII spans redactPii would replace, per kind. */
  def piiCounts(text: Column): Column = {
    // group 0 = whole match: Spark defaults to group 1 and errors on
    // group-less patterns; DuckDB's default already is the whole match.
    def n(re: String, prior: Column) =
      size(regexp_extract_all(prior, lit(re), lit(0)))
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    struct(
      n(EmailRe, text).as("emails"),
      n(Ipv4Re, afterEmail).as("ips"),
      n(PhoneRe, afterIp).as("phones"))
  }

  /** Candidate payment-card number: 13-19 digits with optional single
    * space/dash separators (RE2-safe — no lookarounds). Candidates are
    * VALIDATED with [[luhnValid]] before redaction: a bare digit-run
    * regex over-redacts order ids, timestamps and phone numbers. */
  val CardRe = "[0-9](?:[ -]?[0-9]){12,18}"

  /** Luhn checksum over the digits of `s` (separators ignored): the
    * public mod-10 scheme every card number satisfies. Pure HOF fold —
    * each digit read once, right-to-left, every second digit doubled
    * with the >9 ⇒ −9 reduction. Engine-portable integer arithmetic. */
  def luhnValid(s: Column): Column =
    ExprUtils.evalOnce(regexp_replace(s, "[^0-9]", "")) { ds =>
      ExprUtils.evalOnce(length(ds)) { n =>
        (n > 0) && aggregate(
          sequence(lit(1), n),
          lit(0),
          (acc, i) => {
            val d = call_function("substr", ds, n - i + 1, lit(1)).cast("int")
            val dbl = d * 2
            acc + when(i % 2 === 0,
              when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)
          }) % 10 === 0
      }
    }

  /** Redact Luhn-VALID card numbers to `<CARD>`; Luhn-invalid digit runs
    * are left untouched. regexp_replace cannot replace per-match
    * conditionally, so: extract distinct candidates, filter by checksum,
    * fold exact-string replace over the validated set — all codegen'd
    * array expressions, one pass over candidates per row.
    *
    * The fold order is made EXPLICIT — longest candidate first, ties
    * lexicographic — so when one validated candidate is a substring of
    * another the outcome never depends on extraction order (and any
    * engine replaying the oracle sorts the same way). */
  def redactCards(text: Column): Column =
    ExprUtils.evalOnce(
      array_sort(
        filter(array_distinct(regexp_extract_all(text, lit(CardRe), lit(0))),
          c => luhnValid(c)),
        (l, r) =>
          when(length(l) > length(r), -1)
            .when(length(l) < length(r), 1)
            .when(l < r, -1).when(l > r, 1).otherwise(0))) { valid =>
      aggregate(valid, text, (acc, c) => replace(acc, c, lit("<CARD>")))
    }

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Number of non-overlapping occurrences of `needle` via the
    * length-difference trick — deterministic and engine-portable
    * (same arithmetic is expressible in ANSI SQL for the oracle). */
  def occurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit(""))))
      / lit(needle.length)).cast("long")

  /** BPE-style pre-tokenizer count: word / number / punctuation-run /
    * space-run segments (the GPT-2 pre-tokenization shape, minus the
    * RE2-incompatible lookahead so the same pattern runs in the oracle).
    * Approximates LLM token counts far better than whitespace splitting on
    * code/punctuated text. */
  val bpeishPattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeishPattern)).cast("long")

  /** Winnowing document fingerprints (the public MOSS scheme): hash every
    * character k-gram (rolling window), then keep the minimum hash of each
    * sliding window of `w` consecutive k-gram hashes. Near-identical
    * documents share most fingerprints; used for plagiarism/near-dup
    * detection at fragment granularity. Returns array<bigint> (distinct,
    * sorted). The normalized text and the k-gram hash array are each bound
    * once (evalOnce); total work O(n·k + n·w) per doc. */
  def winnowingFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    winnowingFromHashes(winnowingKgramHashes(text, k), w)

  /** The rolling character k-gram hash sequence winnowing selects from —
    * exposed separately so the hash array can be materialized once (and
    * so an oracle can replay the engine-portable window-min selection
    * below on it). */
  def winnowingKgramHashes(text: Column, k: Int = 5): Column =
    graft.plans.expressions.kgramHashes(normalize(text), k)

  /** HOF twin of [[winnowingKgramHashes]] — the executable spec the
    * native expression is bit-parity-tested against (one substring copy
    * per position in interpreted transform; the native loop is the
    * production path). */
  def winnowingKgramHashesHof(text: Column, k: Int = 5): Column =
    ExprUtils.evalOnce(normalize(text)) { norm =>
      transform(
        sequence(lit(0), greatest(length(norm) - k + 1, lit(1)) - 1),
        i => xxhash64(call_function("substr", norm, i + 1, lit(k))))
    }

  /** Window-min fingerprint selection over a k-gram hash sequence: keep
    * the minimum of each sliding window of `w` hashes, distinct, sorted.
    * Pure integer array logic — any engine replays it from the hashes. */
  def winnowingFromHashes(kgramHashes: Column, w: Int = 4): Column =
    ExprUtils.evalOnce(kgramHashes) { hs =>
      val windows = transform(
        sequence(lit(0), greatest(size(hs) - w + 1, lit(1)) - 1),
        j => array_min(slice(hs, j + 1, lit(w))))
      array_sort(array_distinct(windows))
    }
  /** Winnowing selection with POSITIONS retained: the 1-based index into
    * the k-gram hash sequence of each window's minimum (leftmost on ties),
    * distinct. Where [[winnowingFromHashes]] keeps only the selected hash
    * VALUES, this keeps where they came from, so a shared fingerprint can
    * be traced to the exact characters it covers (`substr(norm, p, k)`)
    * and exact-verified. Pure integer array logic — any engine replays it
    * from the hashes (leftmost-min is `array_position` of the window min
    * in both Spark and DuckDB). */
  def winnowingSelectedPositions(kgramHashes: Column, w: Int = 4): Column =
    graft.plans.expressions.winnowingPositions(kgramHashes, w)

  /** HOF twin of [[winnowingSelectedPositions]] (double window slice,
    * O(n·w)) — kept as the executable spec for the native monotonic-deque
    * expression's bit-parity test. Window argmin positions are
    * non-decreasing as the window slides, so `array_distinct` of the
    * window sequence is already ascending — same order as the native
    * sorted-set output. */
  def winnowingSelectedPositionsHof(kgramHashes: Column, w: Int = 4): Column =
    ExprUtils.evalOnce(kgramHashes) { hs =>
      array_distinct(transform(
        sequence(lit(0), greatest(size(hs) - w + 1, lit(1)) - 1),
        j => (j + array_position(
          slice(hs, j + 1, lit(w)),
          array_min(slice(hs, j + 1, lit(w))))).cast("int")))
    }

  /** Content-defined chunk boundaries (the LBFS/rsync/FastCDC family,
    * gear-style): a rolling hash folds left-to-right over the normalized
    * characters — `h' = 2·h + xxhash64(char)` (the shift ages a
    * character out of influence after 64 steps) — and a position ends a
    * chunk when the low `maskBits` bits of the hash are zero and the
    * chunk has reached `minLen` (or unconditionally at `maxLen`). The
    * hash resets at each boundary, so once two documents share a
    * boundary, every following boundary over shared content is
    * IDENTICAL — an insertion perturbs only the chunk it lands in,
    * which is what makes chunk dedup shift-resistant where fixed-size
    * blocking is not. Returns the 1-based END positions of complete
    * chunks (the tail after the last boundary is the caller's partial
    * chunk). Average chunk length ≈ 2^maskBits past the minimum. Pure
    * higher-order-function fold — no UDF, fully codegen-compatible. */
  def cdcBoundaries(text: Column,
      minLen: Int = 16, maxLen: Int = 256, maskBits: Int = 6): Column =
    graft.plans.expressions.cdcBoundaries(normalize(text),
      minLen, maxLen, maskBits)

  /** The higher-order-function formulation of [[cdcBoundaries]] — the
    * executable specification the native expression is bit-parity-tested
    * against (same precedent as simHash/minHash HOF twins). Interpreted
    * struct-per-character fold: correct, but ~2× the whole query's cost
    * at sf0.1, hence the native default. */
  def cdcBoundariesHof(text: Column,
      minLen: Int = 16, maxLen: Int = 256, maskBits: Int = 6): Column =
    // split-on-empty keeps a trailing "" element (limit -1) — drop it,
    // or the fold would take one phantom step past the last character
    ExprUtils.evalOnce(filter(split(normalize(text), ""),
        c => length(c) > 0)) { chars =>
      val mask = (1L << maskBits) - 1
      val init = struct(lit(0L).as("h"), lit(0).as("since"),
        lit(0).as("pos"), lit(Array.empty[Int]).as("bs"))
      aggregate(chars, init, (acc, c) => {
        // 48-bit rolling state + 32-bit gear value: the shift-and-add
        // stays inside a long under ANSI arithmetic (no overflow), the
        // boundary test reads only the low maskBits bits, and a
        // character still ages out of influence after 48 shifts
        val h2 = pmod(acc.getField("h") * 2 +
          pmod(xxhash64(c), lit(1L << 32)), lit(1L << 48))
        val since2 = acc.getField("since") + 1
        val pos2 = acc.getField("pos") + 1
        val isB = (h2.bitwiseAND(lit(mask)) === 0 && since2 >= minLen) ||
          since2 >= maxLen
        struct(
          when(isB, lit(0L)).otherwise(h2).as("h"),
          when(isB, lit(0)).otherwise(since2).as("since"),
          pos2.as("pos"),
          when(isB, concat(acc.getField("bs"), array(pos2)))
            .otherwise(acc.getField("bs")).as("bs"))
      }, acc => acc.getField("bs"))
    }

  /** Tags whose whole element is dropped (with contents) before tag
    * stripping: executable/presentation payload (script, style) and site
    * chrome (nav, header, footer, aside) — the cheap deterministic core
    * of main-content extraction (the jusText/trafilatura family's first
    * pass). Block patterns are RE2-safe ([\s\S]*? lazy spans, no
    * lookaround), so the DuckDB oracle replays them verbatim. Nested
    * same-tag blocks are out of scope (regex, not a parser), and so is a
    * closing tag inside a string literal — a `"</script>"` payload in JS
    * ends the lazy match early, leaving the rest of the block in the
    * output. Both are documented limitations of the regex tier. */
  val HtmlBoilerplateTags: Seq[String] =
    Seq("head", "script", "style", "nav", "header", "footer", "aside")

  /** `<title>` contents (first match, empty string when absent). */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, "(?i)<title[^>]*>([\\s\\S]*?)</title>", 1)

  /** Count of anchor tags carrying an href — a link-density input (high
    * link share marks navigation/listing pages, a standard quality cut). */
  def htmlLinkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<a\\s[^>]*href"), lit(0)))

  /** Main-content text of an HTML document: boilerplate blocks dropped,
    * remaining tags stripped, the five predefined XML/HTML entities (+
    * nbsp) decoded, whitespace collapsed. Pure codegen'd regexp chain —
    * per-row map work, scan-bound at 100 TB. */
  def htmlMainText(html: Column): Column = {
    // the open tag must end right after the name or continue with an
    // attribute — <head> must never match <header> (nor vice versa)
    val noBlocks = HtmlBoilerplateTags.foldLeft(html) { (c, t) =>
      regexp_replace(c, s"(?i)<$t(\\s[^>]*)?>[\\s\\S]*?</$t\\s*>", " ")
    }
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    // &amp; decodes LAST or "&amp;lt;" would double-decode
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  def normalize(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** BPE merge LEARNING over the corpus (tokenizer training's core
    * loop, Sennrich et al. 2016): repeatedly find the most frequent
    * adjacent symbol pair across the vocabulary and fuse it, returning
    * the learned merge table (rank, pair, fused symbol, weighted pair
    * count). The txt4 tokenizer APPLIES merges; this learns them.
    *
    * Scale shape — the defining trick: the corpus-scale work is ONE
    * aggregation (distinct words with occurrence counts); every merge
    * round then runs on the VOCABULARY (≪ corpus — Heaps' law), so N
    * rounds cost N vocab-scale passes, not N corpus scans. Per round:
    * one pair-count aggregation + a 1-row argmax (bounded driver read,
    * the pageRank-scalar pattern) + one map-side fold rewriting each
    * word's symbol string; vocab persists ping-pong like pageRank's
    * ranks.
    *
    * Engine-exact by construction: symbol sequences are chr(31)-joined
    * strings; the merge applies as a LEFT-TO-RIGHT greedy fold
    * (`aggregate` here, `list_reduce` in the oracle — same
    * accumulator logic, so "aaa" + merge(a,a) → [aa, a] in both);
    * argmax ties break on md5 of the pair (collation-free). Learning
    * runs over the ASCII word core (`[a-z0-9]+` after [[normalize]]) —
    * the standard pre-tokenizer split, and what keeps char indexing
    * and ordering identical across engines. */
  def learnBpeMerges(docs: DataFrame, textCol: String,
      nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = baseBpeVocab(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = try bpeLearn(base, nMerges) finally base.unpersist()
    merges
      .toDF("merge_rank", "pair_left", "pair_right", "weight")
      .select(col("merge_rank"), col("pair_left"), col("pair_right"),
        concat(col("pair_left"), col("pair_right")).as("merged"),
        col("weight"))
  }

  /** The learned tokenizer APPLIED: each vocabulary word with its
    * occurrence count, token count, and segmentation under the merges
    * [[learnBpeMerges]] learns from the SAME corpus - train-then-apply
    * in one call. Application is a STATIC chain of the same greedy
    * fold, one stage per learned merge, evaluated lazily over the base
    * vocabulary (no iteration at eval time - learning's argmax loop
    * already fixed the merges as fold literals). `segmented` joins
    * symbols with spaces (symbols are `[a-z0-9]+` substrings, so the
    * space is unambiguous). Tokenizing the FULL corpus is then a
    * broadcast join of this vocabulary onto exploded words - word
    * tokenization is a pure vocab lookup by construction. */
  def bpeVocabulary(docs: DataFrame, textCol: String,
      nMerges: Int): graft.operators.Materialized = {
    // ONE corpus-scale base aggregation, shared by the merge loop and
    // the final fold chain (r16, guide §2.4 — previously each built its
    // own instance, so the corpus was exploded and aggregated twice).
    // The caller releases the cached base via the returned handle.
    val base = baseBpeVocab(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fin = bpeLearn(base, nMerges)
      .foldLeft(base) {
        case (df, (_, l, r, _)) => foldBpeMerge(df, l, r)
      }
    graft.operators.Materialized(
      fin.select(col("w").as("word"), col("cnt").as("n_occurrences"),
        size(split(col("enc"), BpeSep)).cast("long").as("n_tokens"),
        replace(col("enc"), lit(BpeSep), lit(" ")).as("segmented")),
      Seq(base))
  }

  private val BpeSep = "\u001f"

  /** BYTE-LEVEL BPE learning (the GPT-2-style base vocabulary): every
    * whitespace-delimited word of the NFC-normalized corpus — no ASCII
    * gate, so a multilingual corpus trains on ALL its text — encoded as
    * its UTF-8 byte sequence, one 2-hex-digit symbol per byte. The
    * merge loop, greedy fold, and argmax are [[learnBpeMerges]]'s
    * unchanged (vocab-scale rounds, never corpus rescans); only the
    * base alphabet differs (≤256 byte symbols vs 36 ASCII chars).
    * Case is NOT folded: engines disagree on Unicode case mappings
    * (Turkish İ, ß), and byte-level BPE conventionally trains
    * case-sensitive anyway. Hex symbols keep the symbol alphabet
    * engine-portable (no unprintable bytes inside symbol strings) — the
    * same bijective byte↔printable trick GPT-2's tokenizer uses, with
    * hex pairs instead of a remapped codepage. */
  def learnByteBpeMerges(docs: DataFrame, textCol: String,
      nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = baseByteBpeVocab(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = try bpeLearn(base, nMerges) finally base.unpersist()
    merges
      .toDF("merge_rank", "pair_left", "pair_right", "weight")
      .select(col("merge_rank"), col("pair_left"), col("pair_right"),
        concat(col("pair_left"), col("pair_right")).as("merged"),
        col("weight"))
  }

  /** Byte-level twin of [[bpeVocabulary]]: train-then-apply over the
    * byte base vocabulary; `segmented` space-joins the learned hex-pair
    * symbols (e.g. "C3A9" = one merged é token). */
  def byteBpeVocabulary(docs: DataFrame, textCol: String,
      nMerges: Int): graft.operators.Materialized = {
    // Same one-base-pass sharing as [[bpeVocabulary]] (r16).
    val base = baseByteBpeVocab(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fin = bpeLearn(base, nMerges)
      .foldLeft(base) {
        case (df, (_, l, r, _)) => foldBpeMerge(df, l, r)
      }
    graft.operators.Materialized(
      fin.select(col("w").as("word"), col("cnt").as("n_occurrences"),
        size(split(col("enc"), BpeSep)).cast("long").as("n_tokens"),
        replace(col("enc"), lit(BpeSep), lit(" ")).as("segmented")),
      Seq(base))
  }

  /** Distinct NFC words (whitespace-collapsed, case kept) with counts,
    * UTF-8-byte-split into hex-pair symbol strings — the byte-level
    * base vocabulary. `hex` is uppercase on both Spark and DuckDB, so
    * the symbol strings replay exactly. */
  private def baseByteBpeVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(
        nfc(regexp_replace(trim(col(textCol)), "\\s+", " ")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"),
        concat_ws(BpeSep,
          expr("regexp_extract_all(hex(encode(w, 'UTF-8')), '..', 0)"))
          .as("enc"),
        col("cnt"))

  /** Distinct ASCII-core words with counts, char-split into
    * [[BpeSep]]-joined symbol strings - the ONE corpus-scale step of
    * BPE learning. */
  private def baseBpeVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(normalize(col(textCol)), " ")).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), concat_ws(BpeSep, split(col("w"), "")).as("enc"),
        col("cnt"))

  /** One greedy left-to-right fold applying merge (l, r); the merge
    * rides in as literal columns so symbols never interpolate into SQL
    * text. The symbol array is bound ONCE in its own projection (`__sy`):
    * the aggregate lambda is a CodegenFallback higher-order function, so
    * codegen-level common-subexpression elimination never sees it — the
    * previous inline form re-split `enc` three times per word per round
    * in interpreted eval (r15 optimization, guide §1.2 per-task work). */
  private def foldBpeMerge(df: DataFrame, l: String, r: String): DataFrame =
    df.withColumn("__l", lit(l)).withColumn("__r", lit(r))
      .withColumn("__sy", split(col("enc"), BpeSep))
      .withColumn("enc", expr(
        "aggregate(slice(__sy, 2, size(__sy) - 1), " +
          "element_at(__sy, 1), " +
          "(acc, x) -> CASE WHEN (acc = __l " +
          "OR endswith(acc, concat(char(31), __l))) AND x = __r " +
          "THEN concat(substring(acc, 1, length(acc) - length(__l)), " +
          "__l, __r) " +
          "ELSE concat(acc, char(31), x) END)"))
      .select("w", "enc", "cnt")

  private def bpeLearn(base: DataFrame,
      nMerges: Int): Seq[(Int, String, String, Long)] = {
    require(nMerges >= 1 && nMerges <= 64,
      s"nMerges $nMerges outside [1, 64]")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // The CALLER owns `base`'s persistence (r16): the apply variants
    // (bpeVocabulary/byteBpeVocabulary) reuse the same cached base
    // vocabulary as the seed of the final fold chain — the loop must not
    // persist-then-unpersist it out from under them (that re-ran the
    // corpus-scale base aggregation a second time at output, measured as
    // one of q_txt22's two ~10 s-of-executor-time stages at sf0.1).
    var vocab = base
    var owned = false
    val nVocab = vocab.count()
    // Size the merge loop's map parallelism to the VOCABULARY, not the
    // session (r15 optimization; the duplicateClusters `parts` precedent):
    // every round re-scans the cached vocab twice (argmax + fold), and a
    // full session's worth of tasks over a small vocabulary costs more in
    // task scheduling and allocation churn than the per-row arithmetic.
    // Large vocabularies keep full parallelism through the cap, so
    // nothing changes at cluster scale. `loopView` is a coalesce VIEW of
    // the cached blocks — no second copy.
    val parts = ExprUtils.loopParallelism(nVocab,
      base.sparkSession.sparkContext.defaultParallelism)
    def loopView = vocab.coalesce(parts)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      // Positional pair counts (repeats within a word each count, the
      // standard formulation) -> deterministic argmax: 1 row to the
      // driver, never row data.
      val best = loopView
        .select(split(col("enc"), BpeSep).as("sy"), col("cnt"))
        .filter(size(col("sy")) >= 2)
        .select(col("cnt"), explode(expr(
          "zip_with(slice(sy, 1, size(sy) - 1), slice(sy, 2, size(sy) - 1), " +
            "(a, b) -> struct(a AS l, b AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc,
          md5(concat(col("l"), lit(BpeSep), col("r")).cast("binary")).asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val l = best(0).getString(0)
        val rt = best(0).getString(1)
        merges += ((r + 1, l, rt, best(0).getLong(2)))
        val next = foldBpeMerge(loopView, l, rt).persist(lvl)
        next.count()
        if (owned) vocab.unpersist()
        vocab = next
        owned = true
        r += 1
      }
    }
    if (owned) vocab.unpersist()
    merges.toSeq
  }

  /** 128-bit content fingerprint (md5 of normalized text). Used for exact
    * dedup grouping: identical normalized content ⇒ identical fingerprint. */
  def fingerprint(text: Column): Column =
    md5(normalize(text).cast("binary"))

  /** Unicode NFC canonical composition (native codegen'd expression —
    * Spark has no built-in). Byte-different encodings of the same text
    * ("café" precomposed vs e + combining acute) MUST collapse before
    * any fingerprint/shingle/dedup step sees them; the JDK implements
    * the standard Unicode algorithm, so output matches any conformant
    * engine byte-for-byte. */
  def nfc(text: Column): Column = graft.plans.expressions.nfcNormalize(text)

  /** Tiny per-language stopword profiles for the n-gram/stopword-heuristic
    * language ID. Public knowledge (most-frequent function words). */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " de "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " et ", " les "))

  /** Stopword-hit score for one language profile over padded text. */
  def langScore(text: Column, words: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    words.map(w => occurrences(padded, w)).reduce(_ + _)
  }

  /** Heuristic language ID: argmax of stopword-profile scores, ties broken
    * by profile order, 'und' (undetermined) when all scores are 0. */
  def langId(text: Column): Column = {
    val scores = stopwordProfiles.map { case (lang, ws) => lang -> langScore(text, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    pick
  }

  /** Quality signals (length, word stats, punctuation/digit ratios) — the
    * standard cheap pre-filters of LLM data pipelines. All double-typed,
    * pure arithmetic (no rounding → bit-deterministic across engines). */
  def qualitySignals(text: Column): Seq[(String, Column)] = {
    val chars = length(text)
    val toks = tokenCount(text)
    val punct = length(regexp_replace(text, "[^.,;:!?]", ""))
    val digits = length(regexp_replace(text, "[^0-9]", ""))
    Seq(
      "n_chars_calc" -> chars.cast("long"),
      "n_tokens" -> toks.cast("long"),
      "avg_token_len" -> (chars.cast("double") / toks.cast("double")),
      "punct_ratio" -> (punct.cast("double") / chars.cast("double")),
      "digit_ratio" -> (digits.cast("double") / chars.cast("double")))
  }

  /** Line-level deduplication (the C4/CCNet-style boilerplate scrub):
    * drop every line that occurs in more than `maxDocFreq` distinct
    * documents — navigation chrome, license headers, cookie banners —
    * and reassemble each document from its surviving lines in original
    * order. Returns (id, text_dedup, n_lines_kept, n_lines_dropped);
    * a document whose every line was boilerplate survives with empty
    * text (the caller decides whether to drop it), never disappears.
    *
    * Scale shape: one posexplode scan, a doc-frequency aggregation keyed
    * by a 128-bit line fingerprint (narrow shuffle rows; the distinct
    * pre-pass spreads hot boilerplate lines across reducers by (doc,
    * line) before anything is keyed by line alone), one equi-join back,
    * and a per-document rebuild whose state is bounded by document
    * length. Line ORDER inside a document is restored by position, so
    * the result is partition-layout independent.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq $maxDocFreq must be >= 1")
    // NULL text behaves as the empty document: split(null) is null and
    // size(null) is -1 under the legacy sizeOfNull conf, which would emit
    // n_lines_dropped = -1 — coalesce on BOTH scans keeps the count
    // contract (kept + dropped = total) for null rows.
    val textOrEmpty = coalesce(col(textCol), lit(""))
    val lines = df.select(col(idCol),
        posexplode(split(textOrEmpty, "\n")).as(Seq("__pos", "__line")))
      .withColumn("__lfp", md5(col("__line").cast("binary")))
    val docFreq = lines.select(col(idCol), col("__lfp")).distinct()
      .groupBy("__lfp").agg(count(lit(1)).as("__df"))
    val kept = lines.join(docFreq, Seq("__lfp"))
      .filter(col("__df") <= maxDocFreq)
    val rebuilt = kept.groupBy(idCol).agg(
      concat_ws("\n",
        transform(
          array_sort(collect_list(struct(col("__pos").as("p"), col("__line").as("l")))),
          x => x.getField("l"))).as("text_dedup"),
      count(lit(1)).as("n_lines_kept"))
    df.select(col(idCol),
        size(split(textOrEmpty, "\n")).cast("long").as("__total"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("__total") - coalesce(col("n_lines_kept"), lit(0L)))
          .as("n_lines_dropped"))
  }

  /** Corpus-LM surprisal quality score: the average per-token information
    * content of a document under the corpus's own unigram distribution —
    * the cheap stand-in for the perplexity filters of published pipelines
    * (high = rare-word-heavy / noisy, low = stopword soup; both tails get
    * reviewed). Two aggregation passes over one explode: per-(doc, word)
    * counts (nothing is keyed by a word alone before this, so hot words
    * cannot skew a reducer), corpus word totals from those, then one join
    * back and a per-document fold.
    *
    * Deliberately integer-exact: surprisal is measured in WHOLE bits,
    * `floor(log2 N) − floor(log2 c_w)`, computed from binary-string
    * lengths — no transcendental functions, so any engine reproduces the
    * score bit-for-bit (a cross-engine `ln()` is not guaranteed
    * bit-identical, and this score gates training data where audits must
    * reproduce exactly). The final average is an exact integer sum divided
    * as double. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def floorLog2(x: Column): Column = (length(bin(x)) - 1).cast("long")
    val words = df.select(col(idCol),
      explode(split(normalize(col(textCol)), " ")).as("__w"))
    val perDocWord = words.groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__c"))
    val freq = perDocWord.groupBy("__w").agg(sum("__c").as("__cw"))
    val total = freq.agg(sum("__cw").as("__n"))
    val scored = perDocWord.join(freq, Seq("__w"))
      .crossJoin(broadcast(total))
      .groupBy(idCol)
      .agg(
        sum(col("__c") * (floorLog2(col("__n")) - floorLog2(col("__cw"))))
          .as("__bits"),
        sum(col("__c")).as("__nd"))
      .select(col(idCol),
        (col("__bits").cast("double") / col("__nd").cast("double"))
          .as("surprisal_bits"))
    // Blank documents tokenize to one empty word like every other engine's
    // split(' ') does; they score like any token. Docs never vanish.
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
  }

  /** Bigram-LM surprisal — the CCNet-style perplexity quality filter one
    * model order up from [[unigramSurprisal]]: the average negative
    * log-probability of each adjacent word pair under the corpus's own
    * Laplace-smoothed bigram model,
    * `nll(w1,w2) = log2((c(w1) + V) / (c(w1,w2) + 1))`, summed per
    * document and averaged per bigram. Low = predictable/templated text,
    * high = rare transitions (noise OR genuinely novel prose) — both
    * tails are review queues, exactly how published pipelines use a
    * KenLM score.
    *
    * Integer-exact in 1/1024ths of a bit via the same fixed-point log2
    * as the search rankers (SearchFunctions.ilog2x1024) — no
    * transcendentals, so any engine reproduces the score bit-for-bit,
    * and per-bigram terms are divided BEFORE the sum so shuffle order
    * cannot perturb it.
    *
    * Scale shape: bigram extraction is a map-side transform+explode (no
    * shuffle); counts are two hash aggregations keyed by the
    * high-cardinality bigram/word; the count joins are term-keyed
    * equi-joins (vocab V rides in as an in-plan broadcast 1-row
    * aggregate, so the model builds in ONE action). The
    * (doc,bigram)-level pre-aggregation bounds reducer skew the same way
    * unigramSurprisal's (doc,word) grouping does. Documents with fewer
    * than two words surface with n_bigrams = 0 and zero scores — they
    * never vanish. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val il = SearchFunctions.ilog2x1024 _
    val docs = df.select(col(idCol),
      split(normalize(col(textCol)), " ").as("__ws"))
    val bg = docs.select(col(idCol), explode(expr(
        """CASE WHEN size(__ws) >= 2
          |  THEN transform(sequence(1, size(__ws) - 1),
          |         i -> struct(element_at(__ws, i) AS w1,
          |                     element_at(__ws, i + 1) AS w2))
          |  ELSE array() END""".stripMargin)).as("__b"))
      .select(col(idCol), col("__b.w1").as("__w1"), col("__b.w2").as("__w2"))
    val perDocBg = bg.groupBy(col(idCol), col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__c"))
    val bgCounts = perDocBg.groupBy("__w1", "__w2")
      .agg(sum("__c").as("__cb"))
    val uniCounts = perDocBg.groupBy("__w1").agg(sum("__c").as("__cu"))
    // V (distinct history words) rides IN-PLAN as a broadcast 1-row
    // aggregate, the same pattern as unigramSurprisal's total: a
    // driver-side uniCounts.count() here would be a second ACTION
    // re-running the tokenize/explode/two-level aggregation over the
    // whole corpus just for the scalar (exchange reuse does not span
    // actions) — doubling the query's heaviest shuffle work.
    val vTotal = uniCounts.agg(count(lit(1)).as("__v"))
    val scored = perDocBg
      .join(bgCounts, Seq("__w1", "__w2"))
      .join(uniCounts, Seq("__w1"))
      .crossJoin(broadcast(vTotal))
      .groupBy(idCol)
      .agg(
        sum(col("__c") * (il(col("__cu") + col("__v")) - il(col("__cb") + lit(1L))))
          .as("nll_total_1024"),
        sum(col("__c")).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"), col("nll_total_1024"),
        expr("nll_total_1024 div n_bigrams").as("nll_per_bigram_1024"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_total_1024"), lit(0L)).as("nll_total_1024"),
        coalesce(col("nll_per_bigram_1024"), lit(0L)).as("nll_per_bigram_1024"))
  }

  /** Repetition signals — the boilerplate/degenerate-text filters of the
    * published large-corpus quality pipelines (duplicate-word fraction,
    * most-frequent-word fraction, duplicate word-bigram fraction; the
    * Gopher-style "repetition" family):
    *
    *  - `dup_word_frac`   = 1 − distinct words / total words
    *  - `top_word_frac`   = occurrences of the most frequent word / total
    *  - `dup_bigram_frac` = 1 − distinct bigrams / total bigrams
    *                        (0.0 for documents with fewer than two words)
    *
    * Per-term counting goes through explode + two-level aggregation keyed
    * by (doc, term) — partial (map-side) aggregation absorbs the per-term
    * duplicates before the shuffle, and nothing is ever keyed by term
    * alone, so hot words ("the") cannot skew a reducer. A per-row HOF
    * formulation would be O(terms²) per document (count-of-each-distinct
    * re-scans the array) — the explode plan is linear and whole-stage
    * codegen'd up to the aggregations.
    *
    * `withBigrams = false` omits `dup_bigram_frac` AND its entire
    * explode+aggregate+join pipeline — Catalyst has no left-join
    * elimination, so a caller that only needs the word-level signals
    * would otherwise still pay the bigram shuffle just to discard it.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
      withBigrams: Boolean = true): DataFrame = {
    def stats(term: Column, total: String, uniq: String, top: Option[String]) = {
      val perTerm = df
        .select(col(idCol), explode(term).as("__t"))
        .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
      val aggs = Seq(sum("__c").as(total), count(lit(1)).as(uniq)) ++
        top.map(t => max("__c").as(t))
      perTerm.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
    }
    val words = stats(split(normalize(col(textCol)), " "), "__tw", "__uw", Some("__tc"))
    val wordSignals = Seq(
      (lit(1.0) - col("__uw").cast("double") / col("__tw").cast("double"))
        .as("dup_word_frac"),
      (col("__tc").cast("double") / col("__tw").cast("double"))
        .as("top_word_frac"))
    val base = df.select(col(idCol)).join(words, Seq(idCol), "left")
    if (!withBigrams) base.select(col(idCol) +: wordSignals: _*)
    else {
      val bigrams = stats(DedupFunctions.ngramsAll(col(textCol), 2), "__tb", "__ub", None)
      base.join(bigrams, Seq(idCol), "left")
        .select(col(idCol) +: wordSignals :+
          coalesce(
            lit(1.0) - col("__ub").cast("double") / col("__tb").cast("double"),
            lit(0.0)).as("dup_bigram_frac"): _*)
    }
  }
}
