"""Round-4 training-pipeline operators: Gopher rule suite, text
normalization, per-domain rollup, benchmark n-gram decontamination.
Oracle parity runs via tools/check_contract.py; these tests pin the
operator semantics on crafted fixtures."""

import pyspark.sql.functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- gopher

def test_gopher_rules_each_rule(spark):
    from pears_lite_spark.functions.textstats import gopher_rules
    good = " ".join(["the quick brown fox and that dog have fun with it"] * 3)
    rows = [
        (0, good),                                # passes all (33 words)
        (1, "too short"),                         # fails word count
        (2, " ".join(["a"] * 40)),                # mean word len 1 -> fails
        (3, " ".join(["the", "of"] * 15) + " " + "#" * 1 + " ### # #"),
        (4, " ".join(["1234"] * 25) + " the of"),  # alpha frac low
        (5, " ".join(["zebra"] * 30)),            # no stopwords
        (6, None),                                # null text
    ]
    out = {r["doc_id"]: r for r in
           gopher_rules(_docs(spark, rows), min_words=20).collect()}
    assert out[0]["pass_gopher"]
    assert not out[1]["rule_word_count"]
    assert not out[2]["rule_word_len"]
    assert not out[3]["rule_symbol_ratio"] and out[3]["rule_stopwords"]
    assert not out[4]["rule_alpha"]
    assert not out[5]["rule_stopwords"] and out[5]["n_stop_kinds"] == 0
    assert out[6]["n_words"] == 0 and not out[6]["pass_gopher"]


def test_gopher_symbol_counting(spark):
    from pears_lite_spark.functions.textstats import gopher_rules
    # '....' is ONE non-overlapping '...' match; '…' counts too
    rows = [(0, "a .... b … c " + " ".join(["w"] * 17))]
    r = gopher_rules(_docs(spark, rows), min_words=1).collect()[0]
    # symbol_ratio_r is rounded to 6 decimals
    assert abs(r["symbol_ratio_r"] - 2 / r["n_words"]) < 1e-6


# ---------------------------------------------------------- normalize

def test_normalize_text_controls_and_idempotence(spark):
    from pears_lite_spark.functions.textstats import normalize_text
    rows = [(0, "\ta\x01b  c\x7f  "), (1, "clean already"), (2, None)]
    out = {r["doc_id"]: r for r in
           normalize_text(_docs(spark, rows)).collect()}
    assert out[0]["clean"] == "a b c"
    assert out[1]["clean"] == "clean already"
    assert out[2]["clean"] == "" and out[2]["n_chars_raw"] == 0
    # idempotence: normalizing the clean text is the identity
    again = normalize_text(
        _docs(spark, [(i, out[i]["clean"]) for i in (0, 1, 2)]))
    for r in again.collect():
        assert r["clean"] == out[r["doc_id"]]["clean"]
        assert r["n_chars_raw"] == r["n_chars_clean"]


# ------------------------------------------------------- domain stats

def test_domain_stats_rollup(spark):
    from pears_lite_spark.functions.textstats import domain_stats
    rows = [(0, "aa", "en", "https://a.x.example/p0"),
            (1, "bbbb", "de", "https://a.x.example/p1"),
            (2, "c", "en", "https://b.y.example/p2")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, url string")
    out = {r["host"]: r for r in domain_stats(df).collect()}
    a = out["a.x.example"]
    assert a["reg_domain"] == "x.example"
    assert a["n_docs"] == 2 and a["sum_chars"] == 6 and a["n_langs"] == 2
    assert out["b.y.example"]["n_docs"] == 1


# ------------------------------------------------------ decontaminate

def test_ngram_contamination_planted_leak(spark):
    from pears_lite_spark.functions.decontam import ngram_contamination
    bench_line = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = _docs(spark, [
        (0, "intro words " + bench_line + " outro words"),   # leaked
        (1, "totally unrelated text with plenty of words here"),
        (2, bench_line + " filler " + bench_line),           # repeat -> 1 hit
        (3, "short doc"),                                    # < n tokens
    ])
    bench = spark.createDataFrame([(bench_line,)], "text string")
    out = {r["doc_id"]: r for r in
           ngram_contamination(docs, bench, n=8).collect()}
    assert out[0]["contaminated"] and out[0]["n_hit"] == 1
    assert not out[1]["contaminated"] and out[1]["n_hit"] == 0
    assert out[2]["contaminated"] and out[2]["n_hit"] == 1  # DISTINCT grams
    assert out[3]["n_ngrams"] == 0 and not out[3]["contaminated"]
    # n_ngrams accounting: len >= 8 -> len - 7
    assert out[0]["n_ngrams"] == 12 - 7


def test_ngram_contamination_case_insensitive(spark):
    from pears_lite_spark.functions.decontam import ngram_contamination
    line = "One Two Three Four Five Six Seven Eight"
    docs = _docs(spark, [(0, line.lower())])
    bench = spark.createDataFrame([(line,)], "text string")
    out = ngram_contamination(docs, bench, n=8).collect()[0]
    assert out["contaminated"]


# --------------------------------------------------------- line_dedup

def test_line_dedup_removes_high_df_lines(spark):
    from pears_lite_spark.dedup import line_dedup
    boiler = "accept cookies to continue"
    docs = _docs(spark, [
        (i, f"unique content line {i}\n{boiler}") for i in range(5)
    ] + [(5, "solo doc with its own text")])
    out = {r["doc_id"]: r for r in
           line_dedup(docs, min_doc_freq=5).collect()}
    for i in range(5):
        assert out[i]["n_lines"] == 2 and out[i]["n_kept"] == 1
        assert boiler not in out[i]["text_clean"]
        assert f"unique content line {i}" == out[i]["text_clean"]
    assert out[5]["text_clean"] == "solo doc with its own text"


def test_line_dedup_below_threshold_survives_and_order_kept(spark):
    from pears_lite_spark.dedup import line_dedup
    shared = "shared but rare line"
    docs = _docs(spark, [
        (0, f"first\n{shared}\nlast"),
        (1, f"{shared}\nother"),
    ])
    out = {r["doc_id"]: r for r in
           line_dedup(docs, min_doc_freq=3).collect()}
    assert out[0]["text_clean"] == f"first\n{shared}\nlast"  # order intact
    assert out[1]["n_kept"] == 2


def test_line_dedup_trim_keyed_but_raw_reassembled(spark):
    from pears_lite_spark.dedup import line_dedup
    docs = _docs(spark, [
        (0, "  padded boiler  \nown line zero"),
        (1, "padded boiler\nown line one"),
        (2, " padded boiler \nown line two"),
    ])
    out = {r["doc_id"]: r for r in
           line_dedup(docs, min_doc_freq=3).collect()}
    # trimmed forms match across docs -> all three occurrences removed
    for i in range(3):
        assert "boiler" not in out[i]["text_clean"]
        assert out[i]["n_kept"] == 1


# -------------------------------------------------------- anchor_text

def test_anchor_extraction_and_rollup(spark):
    from pears_lite_spark.sources import anchor_text_rollup, \
        extract_anchors_df
    html = ('<html><body>'
            '<a href="/a">Home</a>'
            '<a href="/a"><b>Home</b></a>'
            '<a href="/a">Start Page</a>'
            '<a href="/b">  About   Us </a>'
            '<a href="https://other.example/x">Other</a>'
            '</body></html>')
    cdf = spark.createDataFrame(
        [("https://s.example/p1", html),
         ("https://s.example/p2", '<a href="/a">Home</a>')],
        "url string, html string")
    anchors = extract_anchors_df(cdf)
    rows = anchors.collect()
    # tag-stripped + whitespace-normalized anchor text
    assert ("https://s.example/p1", "https://s.example/b", "About Us") in [
        (r["url"], r["link"], r["anchor"]) for r in rows]
    out = {r["link"]: r for r in anchor_text_rollup(anchors, 2).collect()}
    a = out["https://s.example/a"]
    assert a["n_anchors"] == 4 and a["n_distinct_anchors"] == 2
    # top-2 by count desc then string: Home(3) | Start Page(1)
    assert a["top_anchors"] == "Home|Start Page"
    assert out["https://other.example/x"]["n_anchors"] == 1


# --------------------------------------------------- classifier_score

def test_classifier_score_exact_and_weights_path(spark):
    from pears_lite_spark.functions.textstats import classifier_score
    docs = _docs(spark, [(0, "alpha beta alpha"), (1, ""), (2, None)])
    out = {r["doc_id"]: r for r in classifier_score(docs).collect()}
    # exact integer logit: repeated token contributes twice
    import hashlib
    def stub_w(tok, dim=4096, seed=0):
        b = int(hashlib.md5(f"{seed}:{tok}".encode()).hexdigest()[:8],
                16) % dim
        return (b * 1103515245 + 12345) % 2000001 - 1000000
    assert out[0]["logit_micro"] == 2 * stub_w("alpha") + stub_w("beta")
    assert out[1]["n_tokens"] == 0 and out[1]["score_r"] == 0.5
    assert out[2]["logit_micro"] == 0  # null text
    # explicit-weights path: all-ones model scores every token 1.0
    ones = [1_000_000] * 16
    out2 = classifier_score(_docs(spark, [(0, "x y z")]),
                            dim=16, weights_micro=ones).collect()[0]
    assert out2["logit_micro"] == 3_000_000
    assert out2["mean_logit_r"] == 1.0


def test_classifier_score_partitioning_invariant(spark):
    from pears_lite_spark.functions.textstats import classifier_score
    rows = [(i, f"tok{i} tok{i%7} shared words here") for i in range(64)]
    a = classifier_score(_docs(spark, rows)).orderBy("doc_id").collect()
    b = classifier_score(_docs(spark, rows).repartition(13)) \
        .orderBy("doc_id").collect()
    assert [r["logit_micro"] for r in a] == [r["logit_micro"] for r in b]


# ---------------------------------------------------- pack_sequences

def test_pack_sequences_spans_and_windows(spark):
    from pears_lite_spark.functions.sampling import pack_sequences
    docs = _docs(spark, [
        (0, " ".join(["w"] * 10)),   # tokens [0, 10)
        (1, " ".join(["w"] * 3)),    # tokens [10, 13)
        (2, ""),                     # dropped
        (3, " ".join(["w"] * 12)),   # tokens [13, 25)
    ])
    out = {r["doc_id"]: r for r in
           pack_sequences(docs, seq_len=8).collect()}
    assert 2 not in out
    assert (out[0]["start_tok"], out[0]["first_seq"],
            out[0]["last_seq"], out[0]["n_seqs"]) == (0, 0, 1, 2)
    assert (out[1]["start_tok"], out[1]["first_seq"],
            out[1]["last_seq"]) == (10, 1, 1)
    assert (out[3]["start_tok"], out[3]["first_seq"],
            out[3]["last_seq"], out[3]["n_seqs"]) == (13, 1, 3, 3)


def test_pack_sequences_matches_single_window(spark):
    # the two-phase bucket cumsum must be bit-identical to the naive
    # global-window form, independent of bucketing/partitioning
    from pears_lite_spark.functions.sampling import pack_sequences
    rows = [(i * 7 % 101, f"{'t ' * (i % 9 + 1)}") for i in range(101)]
    docs = _docs(spark, rows).repartition(11)
    got = pack_sequences(docs, seq_len=16, num_buckets=5) \
        .orderBy("doc_id").collect()
    import itertools
    exp_cum = 0
    exp = {}
    for did, text in sorted(rows):
        n = len(text.split())
        exp_cum += n
        exp[did] = (exp_cum - n, (exp_cum - n) // 16, (exp_cum - 1) // 16)
    for r in got:
        e = exp[r["doc_id"]]
        assert (r["start_tok"], r["first_seq"], r["last_seq"]) == e
