package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting. All built from codegen'd Spark
  * builtins (no UDFs) so they stay inside whole-stage codegen and scale as
  * pure map work — no shuffle, no state, embarrassingly parallel at 100 TB.
  */
object TextAnalysis {

  /** Words: lowercase, split on non-letters (keeps CJK as letter runs). */
  def words(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}]+"), w => w =!= "")

  /** Whitespace token count (the classic `len(text.split())`). */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** BPE-ish token estimate: letter runs, digit runs, and isolated
    * punctuation each count as one token (GPT-2-style pre-tokenizer shape).
    */
  def tokenCountBpe(text: Column): Column =
    coalesce(regexp_count(text, lit("\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]")), lit(0))

  // Stopword profiles for the n-gram/stopword language-ID heuristic — the
  // single source of truth lives next to the native expression so the two
  // paths cannot drift.
  private def stopwords: Map[String, Seq[String]] =
    graft.functions.TextStatsProfiles.stopwords

  private def stopwordHits(ws: Column, lang: String): Column =
    size(filter(ws, w => array_contains(typedLit(stopwords(lang)), w)))

  /** All character/word/stopword statistics in one native single-pass
    * expression ([[graft.functions.TextStats]]) — the builtin-composed
    * equivalents re-scan the text ~10 times through interpreted
    * (CodegenFallback) array lambdas. Compute this struct once per document
    * and derive language/quality from its fields.
    */
  def textStats(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.TextStats(
        org.apache.spark.sql.graftshim.GraftShims.expression(text)))

  /** Intra-document repetition struct (n_bigrams, top_bigram_frac,
    * dup_bigram_frac) in one pass — the Gopher-style boilerplate/looping
    * filter. See [[graft.functions.BigramRepetition]] for semantics.
    */
  def bigramRepetition(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.BigramRepetition(
        org.apache.spark.sql.graftshim.GraftShims.expression(text)))

  /** Span-granular repetition struct (longest_rep_len,
    * distinct_substrings, distinct_ratio) from a per-doc suffix automaton
    * — catches whole repeated TEMPLATES that bigram fractions only see as
    * local stutter. See [[graft.functions.RepeatedSpanStats]].
    */
  def repeatedSpanStats(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.RepeatedSpanStats(
        org.apache.spark.sql.graftshim.GraftShims.expression(text)))

  /** Language ID from a [[textStats]] struct (cheap field arithmetic). */
  def langIdFrom(ts: Column): Column = {
    val scores = Seq("en", "fr", "es", "de").map(l => l -> ts.getField(s"stop_$l"))
    val best = greatest(scores.map(_._2): _*)
    when(ts.getField("n_cjk") > 0, lit("zh"))
      .otherwise(
        when(best <= 0, lit("und"))
          .otherwise(scores.foldRight(lit("und")) { case ((l, sc), acc) =>
            when(sc === best, lit(l)).otherwise(acc)
          }))
  }

  /** Language ID: CJK-character detection plus stopword-profile scoring over
    * {en, fr, es, de}; ties break by fixed language order, no signal -> "und"
    * (undetermined). Deterministic.
    */
  def langId(text: Column): Column = langIdFrom(textStats(text))

  /** Quality components + composite score in [0, 1]:
    * length signal, alphabetic ratio, punctuation density, stopword ratio,
    * mean word length sanity. The standard cheap heuristics used to filter
    * web text for training corpora.
    */
  def qualityComponents(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    val ws = words(text)
    val nWords = size(ws).cast("double")
    val nAlpha = coalesce(regexp_count(text, lit("\\p{L}")), lit(0)).cast("double")
    val nPunct = coalesce(regexp_count(text, lit("[\\p{Punct}]")), lit(0)).cast("double")
    val allStops = typedLit(stopwords.values.flatten.toSeq.distinct)
    val nStop = size(filter(ws, w => array_contains(allStops, w))).cast("double")
    Seq(
      "n_chars" -> len,
      "n_words" -> nWords,
      "alpha_ratio" -> when(len > 0, nAlpha / len).otherwise(lit(0.0)),
      "punct_ratio" -> when(len > 0, nPunct / len).otherwise(lit(0.0)),
      "stopword_ratio" -> when(nWords > 0, nStop / nWords).otherwise(lit(0.0)),
      "mean_word_len" -> when(nWords > 0, nAlpha / nWords).otherwise(lit(0.0)))
  }

  /** Quality-component columns derived from a [[textStats]] struct — same
    * definitions as [[qualityComponents]], one text pass instead of many.
    */
  def qualityComponentsFrom(ts: Column): Map[String, Column] = {
    val len = ts.getField("n_chars").cast("double")
    val nWords = ts.getField("n_words").cast("double")
    val nAlpha = ts.getField("n_alpha").cast("double")
    val nPunct = ts.getField("n_punct").cast("double")
    val nStop = ts.getField("stop_all").cast("double")
    Map(
      "n_chars" -> len,
      "n_words" -> nWords,
      "alpha_ratio" -> when(len > 0, nAlpha / len).otherwise(lit(0.0)),
      "punct_ratio" -> when(len > 0, nPunct / len).otherwise(lit(0.0)),
      "stopword_ratio" -> when(nWords > 0, nStop / nWords).otherwise(lit(0.0)),
      "mean_word_len" -> when(nWords > 0, nAlpha / nWords).otherwise(lit(0.0)))
  }

  /** Composite quality score from a [[textStats]] struct. */
  def qualityScoreFrom(ts: Column): Column = {
    val c = qualityComponentsFrom(ts)
    val lenOk = when(c("n_chars") >= 200 && c("n_chars") <= 50000, 1.0)
      .otherwise(least(c("n_chars") / 200.0, lit(1.0)))
    val alphaOk = least(c("alpha_ratio") / 0.6, lit(1.0))
    val punctOk = when(c("punct_ratio") <= 0.2, 1.0).otherwise(greatest(lit(0.0), lit(1.0) - (c("punct_ratio") - 0.2) * 5))
    val stopOk = least(c("stopword_ratio") / 0.05, lit(1.0))
    val mwlOk = when(c("mean_word_len") >= 2 && c("mean_word_len") <= 12, 1.0).otherwise(0.0)
    round((lenOk + alphaOk + punctOk + stopOk + mwlOk) / 5.0, 4)
  }

  /** Composite quality score: each component mapped to [0,1] and averaged.
    * Deterministic; thresholds follow common web-text filtering folklore
    * (length in [200, 50k], alpha>0.6, punct<0.2, stopwords>0.05,
    * mean word length in [2, 12]).
    */
  def qualityScore(text: Column): Column = qualityScoreFrom(textStats(text))

  /** Crawl-grade HTML-to-text extraction (single-pass native expression):
    * drops comments and script/style bodies, turns tags into word
    * boundaries, decodes the core entities, collapses ASCII whitespace.
    * See [[graft.functions.HtmlToText]] for the exact rules the DuckDB
    * oracle replays.
    */
  def htmlToText(html: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.HtmlToText(
        org.apache.spark.sql.graftshim.GraftShims.expression(html)))

  /** Canonical URL (RFC 3986 syntax normalization + crawl extras:
    * tracking-param strip, query sort) — the dedup/join key for crawl
    * captures. See [[graft.functions.UrlNormalize]] for the exact rules.
    */
  def urlNormalize(url: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.UrlNormalize(
        org.apache.spark.sql.graftshim.GraftShims.expression(url)))

  /** RFC 3986 §5 reference resolution: relative `ref` against `base` —
    * the step between "extracted an href" and "have a fetchable URL".
    * See [[graft.functions.UrlResolve]].
    */
  def urlResolve(base: Column, ref: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.UrlResolveExpr(
        org.apache.spark.sql.graftshim.GraftShims.expression(base),
        org.apache.spark.sql.graftshim.GraftShims.expression(ref)))

  /** `<a href>` targets of an HTML capture resolved to absolute http/https
    * URIs, document order — the frontier-growth extractor (WAT derivation,
    * link graphs). See [[graft.functions.HtmlOutlinks]] for the rules.
    */
  def htmlOutlinks(html: Column, baseUrl: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.HtmlOutlinks(
        org.apache.spark.sql.graftshim.GraftShims.expression(html),
        org.apache.spark.sql.graftshim.GraftShims.expression(baseUrl)))

  /** `<a href>` targets WITH their anchor text, resolved like
    * [[htmlOutlinks]] — the input of an anchor-text index (what other
    * pages call a URL). See [[graft.functions.HtmlAnchors]] for the rules.
    */
  def htmlAnchors(html: Column, baseUrl: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.HtmlAnchors(
        org.apache.spark.sql.graftshim.GraftShims.expression(html),
        org.apache.spark.sql.graftshim.GraftShims.expression(baseUrl)))

  /** Block segmentation of an HTML capture — the measurement half of
    * jusText-style boilerplate removal. See [[graft.functions.HtmlBlocks]]
    * for the segmentation rules and [[extractMainText]] for the policy.
    */
  def htmlBlocks(html: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.HtmlBlocks(
        org.apache.spark.sql.graftshim.GraftShims.expression(html)))

  /** On-page metadata: title, meta-description, `rel=canonical` (resolved
    * like an outlink), and meta-robots noindex/nofollow — the page-side
    * politeness + dedup signals `robots.txt` cannot carry. See
    * [[graft.functions.HtmlMeta]] for the rules.
    */
  def htmlMeta(html: Column, baseUrl: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.HtmlMeta(
        org.apache.spark.sql.graftshim.GraftShims.expression(html),
        org.apache.spark.sql.graftshim.GraftShims.expression(baseUrl)))

  /** jusText-style boilerplate removal (Pomikálek 2011, the algorithm
    * family behind the standard crawl content extractors), re-expressed as
    * declarative Spark SQL over [[htmlBlocks]] segmentation so Catalyst
    * sees every step and a SQL oracle can replay the whole policy:
    *
    *  1. context-free class per block: `bad` when the link-density
    *     permille (`1000 * n_link_chars / n_chars`, exact integer test
    *     via cross-multiplication) exceeds `maxLinkPermille`; else
    *     `short` when `n_chars < minChars`; else `good`.
    *     WITH a stopword profile (`stopwords` non-empty — full jusText):
    *     the stopword-density permille (`1000 * n_stop / n_words`, same
    *     exact cross-multiplication; words are lowercased letter runs)
    *     refines the non-link classes — a short block stays `short` only
    *     at density >= `stopLowPermille` (else `bad`: keyword-stuffed
    *     stubs don't ride a neighbor), a long block is `good` at
    *     >= `stopHighPermille`, `near_good` at >= `stopLowPermille`, and
    *     `bad` below (the keyword-stuffing / navigation-prose class the
    *     link signal alone cannot see). A block with NO letter words at
    *     all (numeric tables, separator rows) is `bad` — the density
    *     tests never pass vacuously on 0/0.
    *  2. neighbor smoothing: a `short` or `near_good` block is promoted
    *     to `good` when the immediately previous or next block in
    *     document order is context-free `good` (headings inherit the
    *     article they title), demoted to `bad` otherwise.
    *  3. `main_text` = the final-`good` blocks, document order,
    *     newline-joined.
    *
    * Output per document: (idCol, n_blocks, n_good_ctx, [n_near_ctx when
    * the stopword signal is on,] n_short_ctx, n_bad_ctx, n_good_final,
    * main_chars, main_text).
    *
    * Scale shape: the block explode is map-only; ONE hash exchange on
    * `idCol` feeds both the lag/lead window and the per-document
    * aggregate (Catalyst reuses the partitioning — no second shuffle).
    * Boilerplate never leaves the executor that segmented it. The
    * stopword test is a per-block scalar over a broadcast-literal list —
    * it rides the same projection.
    */
  def extractMainText(df: DataFrame, htmlCol: String, idCol: String,
      minChars: Int = 80, maxLinkPermille: Int = 350,
      stopwords: Seq[String] = Nil, stopLowPermille: Int = 150,
      stopHighPermille: Int = 400): DataFrame = {
    require(minChars > 0, s"minChars must be positive, got $minChars")
    require(maxLinkPermille >= 0 && maxLinkPermille <= 1000,
      s"maxLinkPermille must be in [0, 1000], got $maxLinkPermille")
    require(stopLowPermille >= 0 && stopHighPermille <= 1000 &&
      stopLowPermille <= stopHighPermille,
      s"stopword thresholds must satisfy 0 <= low <= high <= 1000, " +
        s"got $stopLowPermille/$stopHighPermille")
    val stopMode = stopwords.nonEmpty
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("idx"))
    val measured = df
      .select(col(idCol), explode(htmlBlocks(col(htmlCol))).as("b"))
      .select(col(idCol), col("b.idx").as("idx"), col("b.text").as("text"),
        col("b.n_chars").as("n_chars"), col("b.n_link_chars").as("n_link_chars"))
    val linkBad =
      col("n_link_chars") * 1000 > col("n_chars") * maxLinkPermille
    val blocks =
      if (!stopMode)
        measured.withColumn("ctx_class",
          when(linkBad, lit("bad"))
            .when(col("n_chars") < minChars, lit("short"))
            .otherwise(lit("good")))
      else {
        val words = filter(
          split(lower(col("text")), "[^\\p{L}]+"), t => length(t) > 0)
        val profile = typedLit(stopwords)
        measured
          .withColumn("_nw", size(words).cast("long"))
          .withColumn("_ns",
            size(filter(words, t => array_contains(profile, t))).cast("long"))
          .withColumn("ctx_class",
            // `_nw > 0` gates every density test: a block with NO letter
            // words (numeric tables, separator rows) would otherwise pass
            // `0 >= 0` vacuously and classify good — jusText's intent for
            // a wordless block is `bad`, and a wordless stub must not
            // ride a neighbor either
            when(linkBad, lit("bad"))
              .when(col("n_chars") < minChars,
                when(col("_nw") > 0 &&
                  col("_ns") * 1000 >= col("_nw") * stopLowPermille,
                  lit("short")).otherwise(lit("bad")))
              .when(col("_nw") > 0 &&
                col("_ns") * 1000 >= col("_nw") * stopHighPermille, lit("good"))
              .when(col("_nw") > 0 &&
                col("_ns") * 1000 >= col("_nw") * stopLowPermille,
                lit("near_good"))
              .otherwise(lit("bad")))
          .drop("_nw", "_ns")
      }
    val smoothed = blocks.withColumn("final_class",
      when(col("ctx_class") === "good" || col("ctx_class") === "bad",
        col("ctx_class"))
        .otherwise(when(
          lag(col("ctx_class"), 1).over(w) === "good" ||
            lead(col("ctx_class"), 1).over(w) === "good",
          lit("good")).otherwise(lit("bad"))))
    val counts = Seq(
      sum(when(col("ctx_class") === "good", 1L).otherwise(0L)).as("n_good_ctx")) ++
      (if (stopMode)
        Seq(sum(when(col("ctx_class") === "near_good", 1L).otherwise(0L))
          .as("n_near_ctx"))
      else Nil) ++ Seq(
      sum(when(col("ctx_class") === "short", 1L).otherwise(0L)).as("n_short_ctx"),
      sum(when(col("ctx_class") === "bad", 1L).otherwise(0L)).as("n_bad_ctx"),
      sum(when(col("final_class") === "good", 1L).otherwise(0L)).as("n_good_final"),
      sum(when(col("final_class") === "good", col("n_chars").cast("long"))
        .otherwise(0L)).as("main_chars"),
      array_join(
        transform(
          array_sort(collect_list(when(col("final_class") === "good",
            struct(col("idx"), col("text"))))),
          b => b.getField("text")),
        "\n").as("main_text"))
    smoothed.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_blocks"), counts: _*)
  }

  /** RFC 9309 robots.txt gate — may `agent` fetch `path` under this
    * host's `robots` text? See [[graft.functions.RobotsAllowed]]; the
    * intended plan broadcast-joins host-grain robots onto the URL
    * stream and runs this map-only.
    */
  def robotsAllowed(robots: Column, agent: Column, path: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.RobotsAllowed(
        org.apache.spark.sql.graftshim.GraftShims.expression(robots),
        org.apache.spark.sql.graftshim.GraftShims.expression(agent),
        org.apache.spark.sql.graftshim.GraftShims.expression(path)))

  /** Unicode NFC normalization (canonical composition) — same name and
    * semantics as DuckDB's `nfc_normalize`, so oracles replay it verbatim.
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.NfcNormalize(
        org.apache.spark.sql.graftshim.GraftShims.expression(text)))

  // C0 controls except \t \n \r, plus DEL — the characters a clean corpus
  // never wants; RE2-compatible class so the oracle strips the same set.
  private val controlClass = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Standard text-cleanup pass: NFC-normalize, then strip C0/C1 control
    * characters (keeping tab/newline/CR). Composition of the native NFC
    * expression with the codegen'd `regexp_replace`; both steps replay
    * identically in DuckDB (`nfc_normalize` + the same RE2 class).
    */
  def unicodeClean(text: Column): Column =
    regexp_replace(nfcNormalize(text), controlClass, "")

  /** 64-bit document fingerprint over whitespace-normalized, lowercased text
    * (xxhash64 — codegen'd). Equal fingerprints = exact near-normalized dups.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Deflate compression ratio: low = repetitive/boilerplate, high =
    * noise-like. Cheap corpus-quality signal (native expression).
    */
  def compressionRatio(text: Column): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.CompressionRatio(
        org.apache.spark.sql.graftshim.GraftShims.expression(text)))

  // PII patterns kept RE2-compatible (no lookarounds) so the same regexes
  // run in other engines; word boundaries via explicit delimiters.
  private val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?[0-9]{1,3}[-. ]?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}" -> "<PHONE>",
    "[0-9]{3}-[0-9]{2}-[0-9]{4}" -> "<SSN>",
    "([0-9]{1,3}\\.){3}[0-9]{1,3}" -> "<IP>")

  /** Redact common PII shapes (emails, phone numbers, SSN-format ids, IPv4
    * addresses) with typed placeholders — standard pre-training scrub pass,
    * pure regexp_replace chain (codegen'd, map-only).
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Count of PII matches found (for corpus audits). */
  def piiCount(text: Column): Column =
    piiPatterns.map { case (pat, _) =>
      coalesce(regexp_count(text, lit(pat)), lit(0))
    }.reduce(_ + _)

  /** MOSS winnowing fingerprint set (rolling Rabin-Karp k-gram hashes,
    * per-window minima) — substring-level near-dup detection; overlap via
    * [[Dedup.sortedJaccard]].
    */
  def winnowingFingerprint(text: Column, kGram: Int = 8, window: Int = 4): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(
      graft.functions.WinnowingFingerprint(
        org.apache.spark.sql.graftshim.GraftShims.expression(text), kGram, window))

  /** Word n-gram shingles as an array column (builtin-only n-gram builder):
    * shingle i = words[i..i+n-1] joined by space.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val ws = words(text)
    when(size(ws) < n, when(size(ws) > 0, array(concat_ws(" ", ws))).otherwise(array().cast("array<string>")))
      .otherwise(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
  }

  /** BM25 (Okapi, the +1-idf variant Lucene uses) relevance of every
    * document against a fixed term set, top `k` by score.
    *
    * Scale shape: the tf branch tokenizes once and only tokens matching the
    * (tiny, plan-embedded) query term set survive past the explode, so the
    * aggregation shuffle carries query matches, not the corpus vocabulary.
    * Corpus-level stats (N, avgdl) cost a second tokenize scan here — at
    * real scale those are corpus metadata maintained incrementally at
    * ingest, not recomputed per query — and broadcast back into the scoring
    * join along with the `|terms|`-row doc frequencies. Final top-k is an
    * `orderBy(...).limit(k)` — TakeOrdered, no global sort.
    *
    * Scores are deterministic: ln-based idf, fixed (k1, b), no hashing.
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      k: Int = 20): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val qt = terms.map(_.toLowerCase).distinct
    val toks = docs.select(col(idCol).as("_id"), words(col(textCol)).as("_ws"))
      .select(col("_id"), size(col("_ws")).as("dl"), explode(col("_ws")).as("term"))
      .filter(col("term").isin(qt: _*))
    // materialize tf once (localCheckpoint): it is consumed twice (doc
    // frequencies + scoring) and Catalyst would otherwise re-run the whole
    // scan+tokenize+explode lineage for each consumer. tf is bounded by
    // query-term MATCHES (|terms| rows per doc max), not corpus size.
    val tf = toks.groupBy(col("_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      avg(size(words(col(textCol)))).as("avgdl"))
    // tf is one row per (doc, term), so count(*) IS the doc frequency
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("_s",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    scored.groupBy(col("_id"))
      .agg(sum(col("_s")).as("score"), count(lit(1)).as("n_terms_hit"))
      .select(col("_id").as(idCol), round(col("score"), 4).as("bm25"),
        col("n_terms_hit"))
      .orderBy(col("bm25").desc, col(idCol)).limit(k)
  }

  /** Exact corpus word-frequency table: one row per distinct word with its
    * total occurrence count. The explode produces one row per token, but
    * partial aggregation (map-side combine) collapses each task's tokens to
    * at most |vocab| rows before the exchange — at 100 TB the shuffle is
    * bounded by vocab × tasks, never by token count. Top-k consumers should
    * follow with `orderBy(n.desc).limit(k)` (planned as TakeOrdered, no
    * global sort).
    */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(words(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))

  /** Per-document unigram-LM surprisal statistics — the classic cheap
    * quality/outlier filter: documents whose tokens are improbable under the
    * corpus's own unigram distribution (high mean −log2 p) are candidate
    * junk; near-zero surprisal means boilerplate built from the most common
    * words.
    *
    * Two passes over the tokens: (1) corpus term counts (partial-agg
    * bounded, as in [[wordFrequencies]]); (2) score join. The frequency
    * table is vocab-sized (Zipf-bounded, millions of rows at web scale, not
    * corpus-sized), so AQE plans the score join as a broadcast; the token
    * side is never shuffled.
    */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(words(col(textCol))).as("term"))
    val freq = wordFrequencies(docs, textCol)
    val total = freq.agg(sum(col("n")).as("_total"))
    val probs = freq.crossJoin(broadcast(total))
      .select(col("term"), (col("n") / col("_total")).as("_p"))
    toks.join(broadcast(probs), "term")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(-log2(col("_p"))), 4).as("mean_surprisal"),
        round(max(-log2(col("_p"))), 4).as("max_surprisal"))
  }
}
