"""Text-analysis operators for training-data pipelines.

Language ID (stopword-profile n-gram heuristic), quality scoring
(length / punctuation / stopword ratios), token counting (whitespace +
BPE-ish regex), and document fingerprinting (md5 + winnowing rolling
hash). Everything is built-in-function column algebra (JVM-side,
whole-stage-codegen) — no Python in the path — and each op has an exact
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .extract import LANG_STOPWORDS

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _words(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda x: x != "")


def lang_id(docs_df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang): argmax over language stopword profiles of
    hit counts (with multiplicity); fixed en<de<fr<es precedence on ties,
    'xx' when nothing hits — same rule as extract.detect_lang."""
    # shuffle-free: hit counts (with multiplicity) as per-row array
    # expressions — no explode, no groupBy, whole-stage codegen
    # throughout; null text -> empty token array -> 'xx'
    w = F.filter(F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                         r"\s+"), lambda x: x != "")
    def _hits(words):
        return F.size(F.filter(w, lambda x: x.isin(*words)))

    hits = {lang: _hits(sorted(LANG_STOPWORDS[lang]))
            for lang in ("en", "de", "fr", "es")}
    best = F.greatest(*hits.values())
    pred = (F.when(best <= 0, "xx")
            .when(hits["en"] == best, "en")
            .when(hits["de"] == best, "de")
            .when(hits["fr"] == best, "fr")
            .otherwise("es"))
    return docs_df.select(id_col, pred.alias("pred_lang"))


def quality_scores(docs_df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-doc quality features: n_chars, n_tokens, mean token length,
    stopword_ratio, punct_ratio, and a [0,1] composite `quality`
    (heuristics in the C4/Gopher spirit, deterministic)."""
    w = _words(text_col)
    n_tokens = F.size(w)
    n_chars = F.length(text_col)
    sw = F.size(F.filter(w, lambda x: x.isin(*sorted(LANG_STOPWORDS["en"]))))
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col),
                                                r"[^\w\s]", ""))
    mean_len = F.when(n_tokens > 0,
                      F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
                      / n_tokens).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tokens > 0, sw / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    quality = (F.when(n_tokens < 5, 0.0).otherwise(
        0.4 * F.least(sw_ratio * 4, F.lit(1.0))
        + 0.3 * (1.0 - F.least(punct_ratio * 5, F.lit(1.0)))
        + 0.3 * F.least(n_tokens / 100.0, F.lit(1.0))))
    return docs_df.select(
        id_col, n_chars.alias("n_chars"), n_tokens.alias("n_tokens"),
        mean_len.alias("mean_token_len"), sw_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"), quality.alias("quality"))


def token_counts(docs_df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens): whitespace count and a BPE-ish
    regex token count (letters runs / digit runs / single symbols)."""
    ws = F.size(_words(text_col))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))
    return docs_df.select(id_col, ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def repetition_scores(docs_df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per doc: token count, distinct-
    token fraction, and the token fraction covered by the most frequent
    word bigram. distinct_frac is pure array algebra (no shuffle); the
    top-bigram needs one groupBy keyed by doc_id — partition-local after
    a corpus-partitioned scan, never corpus-wide."""
    w = _words(text_col)
    base = docs_df.select(
        id_col, F.size(w).alias("n_tokens"),
        F.when(F.size(w) > 0,
               F.size(F.array_distinct(w)) / F.size(w))
        .otherwise(F.lit(0.0)).alias("distinct_frac"),
        w.alias("_w"))
    idx = F.sequence(F.lit(0), F.size("_w") - 2)
    bg = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("_w", i + 1, 2)))
    bigrams = (base.filter(F.size("_w") >= 2)
               .select(id_col, F.explode(bg).alias("bg"))
               .groupBy(id_col, "bg").agg(F.count("*").alias("c"))
               .groupBy(id_col).agg(F.max("c").alias("top_bg")))
    return (base.drop("_w").join(bigrams, id_col, "left")
            .select(id_col, F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.round("distinct_frac", 6).alias("distinct_frac_r"),
                    F.round(F.when(F.col("n_tokens") > 0,
                                   F.coalesce(F.col("top_bg") * 2.0, F.lit(0.0))
                                   / F.col("n_tokens"))
                            .otherwise(0.0), 6).alias("top_bigram_frac_r")))


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def redact_pii(docs_df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Training-data scrubbing: count and redact email / IPv4 literals
    (regexp column algebra, zero shuffle). Returns (doc_id, n_emails,
    n_ips, clean) with `[EMAIL]` / `[IP]` placeholders."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), 0))
    clean1 = F.regexp_replace(t, PII_EMAIL_RE, "[EMAIL]")
    n_ips = F.size(F.regexp_extract_all(clean1, F.lit(PII_IPV4_RE), 0))
    clean = F.regexp_replace(clean1, PII_IPV4_RE, "[IP]")
    return docs_df.select(
        id_col, n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"), clean.alias("clean"))


def fingerprints(docs_df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", shingle_n: int = 5,
                 window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003): hash
    every `shingle_n`-gram (md5), keep the MIN hash of each sliding
    window of `window` consecutive shingles, distinct per doc.
    (doc_id, fingerprint:string). md5 keeps the DuckDB oracle exact."""
    toks = _words(text_col)
    df = docs_df.select(id_col, toks.alias("_t"))
    idx = F.sequence(F.lit(0), F.size("_t") - shingle_n)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("_t", i + 1,
                                                             shingle_n)))
    exploded = (df.filter(F.size("_t") >= shingle_n)
                .select(id_col, F.posexplode(sh).alias("ord", "shingle"))
                .withColumn("h", F.md5("shingle")))
    w = (Window.partitionBy(id_col).orderBy("ord")
         .rowsBetween(0, window - 1))
    return (exploded.withColumn("fp", F.min("h").over(w))
            .select(id_col, F.col("fp").alias("fingerprint")).distinct())


# Gopher rule-suite stopwords (Rae et al. 2021, table A1's "stop word"
# rule uses this fixed 8-word list, not a full stopword lexicon)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs_df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000) -> DataFrame:
    """Gopher-style quality rule suite (Rae et al. 2021 table A1) as
    per-doc boolean columns plus the conjunction: word count in
    [min_words, max_words], mean word length in [3, 10], symbol-to-word
    ratio ('#' chars + '...'/'…' runs) <= 0.1, >= 80% of words contain
    an alphabetic character, and >= 2 distinct words from the fixed
    8-word stop list. Pure column algebra — zero shuffle, whole-stage
    codegen; exact DuckDB oracle. Returns (doc_id, n_words,
    mean_word_len_r, symbol_ratio_r, alpha_frac_r, n_stop_kinds,
    rule_* booleans, pass_gopher)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    w = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != "")
    n = F.size(w)
    # sum of word lengths == length of the text with all whitespace
    # removed (words are exactly the \s+-split pieces)
    wlen_sum = F.length(F.regexp_replace(t, r"\s+", ""))
    mean_wl = F.when(n > 0, wlen_sum / n).otherwise(F.lit(0.0))
    n_hash = F.size(F.regexp_extract_all(t, F.lit(r"#"), 0))
    n_ell = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), 0))
    sym_ratio = F.when(n > 0, (n_hash + n_ell) / n).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n > 0,
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / n
    ).otherwise(F.lit(0.0))
    n_stop = F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        lambda s: F.array_contains(w, s)))
    r_wc = (n >= min_words) & (n <= max_words)
    r_wl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    r_sym = sym_ratio <= 0.1
    r_alpha = alpha_frac >= 0.8
    r_stop = n_stop >= 2
    return docs_df.select(
        id_col, n.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len_r"),
        F.round(sym_ratio, 6).alias("symbol_ratio_r"),
        F.round(alpha_frac, 6).alias("alpha_frac_r"),
        n_stop.cast("long").alias("n_stop_kinds"),
        r_wc.alias("rule_word_count"), r_wl.alias("rule_word_len"),
        r_sym.alias("rule_symbol_ratio"), r_alpha.alias("rule_alpha"),
        r_stop.alias("rule_stopwords"),
        (r_wc & r_wl & r_sym & r_alpha & r_stop).alias("pass_gopher"))


def normalize_text(docs_df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Training-data text normalization: map C0/DEL control characters
    to spaces, collapse whitespace runs to one space, trim. Zero
    shuffle, regexp column algebra only (Java and RE2 agree on every
    pattern used, so the DuckDB oracle is exact). Returns (doc_id,
    n_chars_raw, n_chars_clean, clean)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    no_ctrl = F.regexp_replace(t, r"[\x00-\x1f\x7f]", " ")
    clean = F.trim(F.regexp_replace(no_ctrl, r"\s+", " "))
    return docs_df.select(
        id_col, F.length(t).cast("long").alias("n_chars_raw"),
        F.length(clean).cast("long").alias("n_chars_clean"),
        clean.alias("clean"))


def domain_stats(docs_df: DataFrame, url_col: str = "url",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-host corpus rollup — the crawl-operations view (which hosts
    dominate the corpus, at what quality): host + registered domain
    (last two dot-labels) via the JVM parse_url builtin, then one
    map-side-combined aggregate keyed by host. Hosts are ~millions at
    web scale — orders of magnitude smaller than docs — so the shuffle
    carries only partial aggregates. Returns (host, reg_domain, n_docs,
    sum_chars, n_langs)."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    parts = F.split(host, r"\.")
    reg = F.when(F.size(parts) >= 2,
                 F.concat_ws(".", F.slice(parts, F.size(parts) - 1, 2))
                 ).otherwise(host)
    return (docs_df
            .select(host.alias("host"), reg.alias("reg_domain"),
                    F.length("text").alias("_chars"), "lang")
            .groupBy("host", "reg_domain")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("_chars").cast("long").alias("sum_chars"),
                 F.count_distinct("lang").cast("long").alias("n_langs")))


def classifier_score(docs_df: DataFrame, dim: int = 4096, seed: int = 0,
                     weights_micro: list[int] | None = None,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Model-based quality filtering, fastText/DCLM-style: a linear
    classifier over hashed bag-of-words features, the standard
    learned-filter stage of a web-text pipeline. Per token: feature
    bucket = md5-hash mod `dim`; the bucket's weight is added to the
    doc's logit; score = sigmoid(mean logit). Returns (doc_id,
    n_tokens, logit_micro, mean_logit_r, score_r).

    Weights are integers in MICRO units (1e-6), summed exactly as
    longs, so the distributed sum is bit-identical to any oracle
    regardless of partitioning (the unigram_loglik fixed-point
    pattern). Pass a real model via `weights_micro` (a dim-length
    list, broadcast into the plan as an array literal — the model IS
    the broadcast side); the default is a deterministic arithmetic
    stub standing in for trained weights (no model ships in this
    sandbox), with every piece of the real plumbing — hashing, lookup,
    exact aggregation — live and oracle-checked.

    Scale shape: zero shuffle — the whole computation is a per-row
    fold over the token array (F.aggregate), whole-stage codegen,
    nothing leaves the scan task."""
    toks = F.filter(F.split(F.lower(F.coalesce(F.col(text_col),
                                               F.lit(""))), r"\s+"),
                    lambda x: x != "")
    n = F.size(toks)

    def bucket(t):
        return F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), t)), 1, 8),
            16, 10).cast("long") % dim

    if weights_micro is not None:
        if len(weights_micro) != dim:
            raise ValueError(f"weights_micro must have length {dim}")
        warr = F.array(*[F.lit(int(w)).cast("long")
                         for w in weights_micro])

        def weight(t):
            return F.try_element_at(warr, (bucket(t) + 1).cast("int"))
    else:
        # deterministic stub: an LCG over the bucket id, mapped to
        # [-1e6, 1e6] micro-units (i.e. weights in [-1, 1])
        def weight(t):
            return (bucket(t) * 1103515245 + 12345) % 2000001 - 1000000

    logit = F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, t: acc + weight(t))
    mean = F.when(n > 0, logit / n / 1e6).otherwise(F.lit(0.0))
    return docs_df.select(
        id_col, n.cast("long").alias("n_tokens"),
        logit.cast("long").alias("logit_micro"),
        F.round(mean, 6).alias("mean_logit_r"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean)), 6)
        .alias("score_r"))


def unigram_loglik(docs_df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """LM-based quality signal (the CCNet/Wikipedia-LM filter pattern,
    with the shipped SentencePiece unigram model itself as the LM):
    tokenize, look each piece's log-prob up in the binary model, and
    score the doc by total/mean piece log-prob. Low (very negative)
    means the doc is made of rare pieces — gibberish, wrong language,
    or byte soup; the standard pretraining-corpus filter signal.

    Determinism: scores go in as fixed-point 1e6 integers, so the
    distributed SUM is exact integer arithmetic — bit-identical to any
    oracle regardless of partitioning or summation order (a float sum
    would differ in the last ulps run-to-run). Output:
    (doc_id, n_pieces, sum_lp_e6, avg_logprob)."""
    from ..index.build import tokenize_spm
    from ..vocab import UNK_LOGPROB, get_vocab
    v = get_vocab()
    spark = docs_df.sparkSession
    scores = spark.createDataFrame(
        [(p, int(round(lp * 1e6))) for p, lp in v.logprob.items()],
        "piece string, s long")
    toks = tokenize_spm(docs_df.select(id_col, text_col))
    ex = toks.select(id_col, F.explode("tokens").alias("piece"))
    unk = int(round(UNK_LOGPROB * 1e6))
    j = (ex.join(F.broadcast(scores), "piece", "left")
         .withColumn("s", F.coalesce("s", F.lit(unk))))
    return (j.groupBy(id_col)
            .agg(F.count("*").alias("n_pieces"),
                 F.sum("s").alias("sum_lp_e6"))
            .select(id_col, "n_pieces", "sum_lp_e6",
                    (F.col("sum_lp_e6")
                     / (F.col("n_pieces") * F.lit(1000000.0)))
                    .alias("avg_logprob")))
