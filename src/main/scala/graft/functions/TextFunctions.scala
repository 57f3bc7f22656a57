package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting.
  *
  * All pure column expressions (codegen'd, shuffle-free, scale-invariant) with
  * deterministic semantics reproducible in ANSI SQL for the oracle harness.
  */
object TextFunctions {

  /** Whitespace/punctuation tokenizer: lowercase, split on non-alphanumeric
    * runs, drop empties. A BPE-ish regex split — the standard cheap
    * approximation for token counting in data pipelines. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Token count under [[tokens]]. */
  def token_count(text: Column): Column = size(tokens(text))

  /** Character n-gram shingles of the normalized text (dedup input).
    * The normalized text is let-bound so it is computed once per row, not
    * once per shingle index ([[Functions.bind]]). */
  def char_shingles(text: Column, n: Int): Column =
    Functions.bind(regexp_replace(lower(text), "\\s+", " ")) { norm =>
      val count = length(norm) - (n - 1)
      when(count >= 1, transform(sequence(lit(1), count), i => norm.substr(i, lit(n))))
        .otherwise(array())
    }

  /** Word n-gram shingles over [[tokens]]; token array let-bound once. */
  def word_shingles(text: Column, n: Int): Column =
    Functions.bind(tokens(text))(ts => word_shingles_of(ts, n))

  /** Shingles from an already-materialized token array column (must be an
    * attribute or lambda variable — anything cheap to re-evaluate). */
  def word_shingles_of(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n))))
    ).otherwise(array())

  // --------------------------------------------------------------------------
  // Language identification: stopword-profile heuristic. Counts hits of a
  // tiny per-language marker lexicon among the tokens; argmax wins, 'en' on
  // tie/no-hit (deterministic tie-break by fixed language order).
  // --------------------------------------------------------------------------

  /** Public so the SQL-oracle generator can reproduce the scoring exactly. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "por", "que"),
    "zh" -> Seq("de5", "shi4", "zai4", "he2", "you3", "wo3", "bu4"))

  private def markerHits(ts: Column, markers: Seq[String]): Column =
    size(filter(ts, t => t.isin(markers.map(lit(_)): _*)))

  /** Predicted language code; ties broken by declaration order ('en' first).
    * Tokens and the per-language hit counts are each let-bound once — the
    * naive expression re-tokenizes per language and re-counts per CASE arm. */
  def lang_id(text: Column): Column =
    Functions.bind(tokens(text)) { ts =>
      Functions.bind(array(langMarkers.map { case (_, ms) => markerHits(ts, ms) }: _*)) { hits =>
        val best = array_max(hits)
        langMarkers.zipWithIndex.reverse
          .foldLeft(lit(langMarkers.head._1)) { case (acc, ((l, _), i)) =>
            when(element_at(hits, i + 1) === best && best > 0, lit(l)).otherwise(acc)
          }
      }
    }

  // --------------------------------------------------------------------------
  // Quality scoring: cheap heuristics over length / punctuation / stopword
  // ratios, quantized to 4 decimals so the oracle reproduces it exactly.
  // --------------------------------------------------------------------------

  /** Public so the SQL-oracle generator can reproduce the scoring exactly. */
  val enStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "with")

  /** Composite quality score in [0,1]:
    * 0.4·lengthScore + 0.3·stopwordScore + 0.3·(1 − punctRatio), where
    * lengthScore saturates at 500 chars and stopwordScore at a 10% stopword
    * ratio. All intermediate arithmetic is integer-exact; the final division
    * and rounding are IEEE-deterministic. */
  def quality_score(text: Column): Column =
    Functions.bind(tokens(text)) { ts =>
      val nChars = length(text).cast("double")
      val nTok = greatest(size(ts), lit(1)).cast("double")
      val nStop = size(filter(ts, t => t.isin(enStopwords.map(lit(_)): _*))).cast("double")
      val nPunct = (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))).cast("double")
      val lengthScore = least(nChars / 500.0, lit(1.0))
      val stopScore = least(nStop / nTok / 0.10, lit(1.0))
      val punctScore = lit(1.0) - least(nPunct / greatest(nChars, lit(1.0)), lit(1.0))
      Functions.qround(lengthScore * 0.4 + stopScore * 0.3 + punctScore * 0.3, 4)
    }

  /** Canonical text normalization — the cleanup pass every pipeline runs
    * before dedup/fingerprinting so byte-level noise does not defeat
    * content-level equality: (1) control characters stripped except
    * newline and tab — FIRST, because NUL in particular trips C-string
    * semantics in downstream libraries (DuckDB's `nfc_normalize`
    * truncates at it); (2) Unicode NFC composition (combining sequences
    * → precomposed, [[KernelExprs.nfc]] — `nfc_normalize` is the oracle
    * twin); (3) space/tab runs collapsed to one space; (4) outer spaces
    * trimmed. Newlines survive — line structure feeds [[gopher_rules]]
    * and paragraph dedup downstream. */
  def normalize_text(text: Column): Column =
    trim(regexp_replace(KernelExprs.nfc(regexp_replace(text,
      "[\\x00-\\x08\\x0B-\\x1F\\x7F]", "")), "[ \\t]+", " "))

  /** The GOPHER document-quality rule set (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", appendix A1.1 — the public recipe
    * RefinedWeb/FineWeb/Dolma all derive from), as ONE codegen'd struct
    * per document: the measured signals, each rule's verdict, and the
    * conjunction `keep`. Pipelines filter on `keep` or loosen single
    * rules from the signals — no second pass over the text. Thresholds
    * (per the paper): 50 ≤ words ≤ 100000; mean word length in [3, 10];
    * symbol-to-word ratio (# or …) ≤ 0.1; ≤ 90% of lines start with a
    * bullet; ≤ 30% end with an ellipsis; ≥ 80% of words contain an
    * alphabetic character; ≥ 2 distinct of the required stopwords
    * (the/be/to/of/and/that/have/with). All ratios are [[Functions
    * .qround]]-rounded so every signal is engine-reproducible. */
  def gopher_rules(text: Column): Column =
    Functions.bind(tokens(text)) { ts =>
      Functions.bind(filter(split(regexp_replace(text, "\r", ""), "\n"),
        l => length(trim(l)) > 0)) { lines =>
        val nWords = size(ts).cast("long")
        val nWordsD = greatest(nWords, lit(1L)).cast("double")
        val meanLen = Functions.qround(
          aggregate(ts, lit(0L), (acc, t) => acc + length(t))
            .cast("double") / nWordsD, 6)
        // symbols: '#' occurrences + '...'/'…' occurrences, per word
        val hashes = length(text) -
          length(regexp_replace(text, "#", ""))
        val ell = ((length(text) -
          length(regexp_replace(text, "\\.\\.\\.", ""))) / 3) +
          (length(text) - length(regexp_replace(text, "…", "")))
        val symbolRatio = Functions.qround(
          (hashes + ell).cast("double") / nWordsD, 6)
        val nLinesD = greatest(size(lines), lit(1)).cast("double")
        val bulletFrac = Functions.qround(size(filter(lines,
          l => trim(l).rlike("^[-*•]"))).cast("double") / nLinesD, 6)
        val ellipsisFrac = Functions.qround(size(filter(lines,
          l => trim(l).rlike("(\\.\\.\\.|…)$"))).cast("double") / nLinesD, 6)
        val alphaFrac = Functions.qround(size(filter(ts,
          t => t.rlike("[a-z]"))).cast("double") / nWordsD, 6)
        val stopHits = size(array_intersect(ts, array(
          Seq("the", "be", "to", "of", "and", "that", "have", "with")
            .map(lit(_)): _*))).cast("long")
        val keep = nWords.between(50L, 100000L) &&
          meanLen.between(3.0, 10.0) && symbolRatio <= 0.1 &&
          bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
          alphaFrac >= 0.8 && stopHits >= 2L
        struct(nWords.as("n_words"), meanLen.as("mean_word_len"),
          symbolRatio.as("symbol_ratio"), bulletFrac.as("bullet_frac"),
          ellipsisFrac.as("ellipsis_frac"), alphaFrac.as("alpha_frac"),
          stopHits.as("stop_hits"), keep.as("keep"))
      }
    }

  /** Rolling polynomial fingerprint over tokens: fold
    * h ← (h·31 + hash60(t) mod 10^6) mod 1 000 000 007. Order-sensitive, so
    * it discriminates documents with identical token multisets but different
    * order; bounded so it never overflows a signed 64-bit in any engine. */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (h, t) => (h * 31L + Functions.hash60(t) % 1000000L) % 1000000007L)

  // --------------------------------------------------------------------------
  // PII redaction: the scrubbing pass a training corpus takes before the
  // model sees it. Pure regexp_replace chains (codegen'd, shuffle-free);
  // the patterns are RE2-compatible so the DuckDB oracle applies the SAME
  // expressions (q89). Order matters: emails first (their local parts may
  // contain digits), then IPs (dotted digits a phone pattern would chew),
  // then phone-ish digit runs.
  // --------------------------------------------------------------------------

  /** Public so the SQL-oracle generator uses the identical patterns. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val phoneRe = "\\+?\\d[\\d -]{6,}\\d"

  /** Replace emails, IPv4s and phone-like digit runs with typed tags. */
  def redact_pii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Count of matches of `pattern` in `text` (pre-redaction audit column). */
  def pii_count(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  // --------------------------------------------------------------------------
  // Repetition signals (the Gopher/MassiveText-style quality gates): highly
  // repetitive documents are low-value training data. Both signals are
  // per-row column folds — O(len·log len) per document, no explode, no
  // shuffle, so the 100 TB corpus keeps its partitioning.
  // --------------------------------------------------------------------------

  /** Fraction of token occurrences that are repeats: 1 − distinct/total
    * (0 for empty docs), q6-rounded. */
  def dup_token_fraction(text: Column): Column =
    Functions.bind(tokens(text)) { ts =>
      when(size(ts) > 0,
        Functions.qround(lit(1.0) -
          size(array_distinct(ts)).cast("double") / size(ts), 6))
        .otherwise(lit(0.0))
    }

  /** Fraction of word n-gram occurrences taken by the single most frequent
    * n-gram (0 when the doc has no n-grams), q6-rounded. Computed as the
    * longest equal run of the SORTED shingle array — one sort + one fold
    * per row instead of a per-doc group-by. */
  def top_ngram_fraction(text: Column, n: Int): Column =
    Functions.bind(word_shingles(text, n)) { shs =>
      val best = aggregate(
        sort_array(shs),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
            .otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
      when(size(shs) > 0,
        Functions.qround(best.cast("double") / size(shs), 6))
        .otherwise(lit(0.0))
    }
}
