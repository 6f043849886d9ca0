"""Deterministic synthetic web corpus in the exact input-hint shape.

BASELINE.json input_hint: Iceberg table of Common-Crawl-style pages with
columns (url:string, warc_ts:timestamp, html:binary, text:string,
lang:string). No external data is allowed in this sandbox, so this
module synthesizes that table at any scale with a seeded generator
(FIXTURES.md §1): HTML from a fixed template whose jusText-style
extraction output is known a priori — the stored `text` column IS the
expected extraction, letting pytest assert the per-row byte-identical
invariant end-to-end.

Layout mirrors FIXTURES.md:
  <html><head><title>..</title></head><body>
  <nav>high-link-density boilerplate</nav>
  <p>content paragraph</p> x k
  <footer>short boilerplate</footer></body></html>

Also generates the deterministic reference query set (FIXTURES.md §2):
single-term / multi-term / planted-phrase / zero-hit / OOV queries.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

SEED = 42
EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)

# ~2000-word lexicon: English function words first (Zipf head, guarantees
# jusText stopword density), then content words, then synthetic tail.
_FUNCTION_WORDS = (
    "the of and to a in is was as for on with that it by at from his he "
    "this are be or an were which have not they had her she its but one "
    "all their there when who more no if out so up what about into them "
    "can only other time new some could these two may then do first any "
    "my now such like our over man me even most made after also did many "
    "before must through years where much your way well down should "
    "because each just those people how too little good world very still "
    "see own men work long here get both between life being under never "
    "day same another know while last might us great old year off come "
    "since against go came right used take three".split())
_CONTENT_WORDS = (
    "water system government city country school house music film history "
    "science nature market company power light green river mountain "
    "forest ocean island bridge garden winter summer spring autumn "
    "morning evening night silver golden stone glass paper letter story "
    "window door street road train engine wheel signal metal copper "
    "energy signal carbon oxygen planet galaxy comet meteor crystal "
    "valley desert meadow harbor castle temple palace tower market "
    "village festival season harvest flower orchard watermelon pumpkin "
    "maple cedar willow falcon sparrow salmon dolphin tiger elephant "
    "giraffe penguin walrus beaver badger marmot lantern compass anchor "
    "voyage journey caravan traveler merchant scholar library archive "
    "museum gallery theater concert melody rhythm harmony chorus violin "
    "trumpet piano guitar drummer painter sculptor poet novelist editor "
    "printer binder weaver tailor baker butcher miller farmer shepherd "
    "fisher hunter ranger pilot sailor captain admiral general colonel "
    "sergeant doctor nurse surgeon dentist teacher student professor "
    "dean principal mayor senator judge lawyer clerk cashier broker "
    "trader banker miner welder plumber mason carpenter architect "
    "engineer chemist physicist biologist geologist astronomer".split())


def build_lexicon(n_words: int = 2000) -> list[str]:
    lex = list(dict.fromkeys(_FUNCTION_WORDS + _CONTENT_WORDS))
    i = 0
    while len(lex) < n_words:
        lex.append(f"term{i:04d}")
        i += 1
    return lex[:n_words]


LEXICON = build_lexicon()
PHRASES = [
    "watermelon festival season",
    "silver river bridge",
    "golden harvest moon market",
    "crystal mountain valley",
    "ancient temple archive",
    "violin concert melody",
    "falcon sparrow migration",
    "copper lantern compass",
    "desert caravan journey",
    "harbor lighthouse signal",
]

_DE_WORDS = ("der die das und ist von zu mit den im für auf des ein eine "
             "nicht sich dem als auch wasser stadt land schule haus musik "
             "geschichte natur markt fluss berg wald insel garten winter").split()
_FR_WORDS = ("le la les de des et un une du en est que pour dans qui par "
             "sur au avec ville pays école maison musique histoire nature "
             "marché fleuve montagne forêt île jardin hiver été").split()


def _zipf_weights(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1)
    return w / w.sum()


def _render_html(title: str, paragraphs: list[str], year: int) -> str:
    parts = [
        f"<html><head><title>{title}</title></head><body>\n",
        '<nav><a href="/">home</a> <a href="/about">about</a> '
        '<a href="/contact">contact</a></nav>\n',
    ]
    for p in paragraphs:
        parts.append(f"<p>{p}</p>\n")
    parts.append(f"<footer>copyright {year}</footer>\n</body></html>")
    return "".join(parts)


def expected_text(paragraphs: list[str]) -> str:
    """What extract.extract_html returns for the template: kept content
    paragraphs joined with ' ' + trailing space (htmlparser.py:104-106)."""
    return "".join(p + " " for p in paragraphs)


def gen_corpus(n_docs: int, seed: int = SEED) -> pd.DataFrame:
    """(url, warc_ts, html:bytes, text, lang) pandas frame, deterministic."""
    rng = np.random.default_rng(seed)
    nlex = len(LEXICON)
    weights = _zipf_weights(nlex)
    lex_arr = np.array(LEXICON)
    rows = []
    for i in range(n_docs):
        lang = "en"
        r = i % 100
        if r == 97:
            lang = "de"
        elif r == 98:
            lang = "fr"
        elif r == 99:
            lang = "xx"
        n_paras = int(rng.integers(1, 6))
        paragraphs = []
        for _ in range(n_paras):
            n_words = int(rng.integers(40, 121))
            if lang == "en":
                words = list(lex_arr[rng.choice(nlex, size=n_words, p=weights)])
            elif lang == "de":
                words = list(rng.choice(_DE_WORDS, size=n_words))
            elif lang == "fr":
                words = list(rng.choice(_FR_WORDS, size=n_words))
            else:  # 'xx': no recognizable function words
                words = [f"zq{int(x):03d}" for x in rng.integers(0, 500, n_words)]
            paragraphs.append(" ".join(words))
        # plant phrases verbatim into known docs (FIXTURES.md §2)
        if lang == "en" and i % 17 == 0:
            ph = PHRASES[(i // 17) % len(PHRASES)]
            paragraphs[0] = paragraphs[0] + " " + ph
        if lang == "xx":
            title = " ".join(f"zq{int(x):03d}" for x in rng.integers(0, 500, 4))
        else:
            title = " ".join(lex_arr[rng.choice(nlex, size=4, p=weights)])
        # undetectable-language pages extract to empty text (the reference
        # rejects pages langdetect can't place — htmlparser.py:98-102)
        text = "" if lang == "xx" else expected_text(paragraphs)
        rows.append((
            f"https://site{i % 97}.example/{lang}/page{i}",
            EPOCH + _dt.timedelta(seconds=137 * i),
            _render_html(title, paragraphs, 2020 + i % 6).encode("utf-8"),
            text,
            lang,
        ))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def write_corpus_parquet(path: str, n_docs: int, seed: int = SEED,
                         docs_per_file: int = 2500) -> str:
    """Write the corpus as a DIRECTORY of parquet files (~docs_per_file
    each) — the shape a Common-Crawl-style snapshot actually has, and
    what makes the scan splittable across executors without shuffling
    the html payload."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    pdf = gen_corpus(n_docs, seed)
    schema = pa.schema([
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ])
    os.makedirs(path, exist_ok=True)
    nf = max(1, (n_docs + docs_per_file - 1) // docs_per_file)
    for i in range(nf):
        chunk = pdf.iloc[i * docs_per_file:(i + 1) * docs_per_file]
        pq.write_table(
            pa.Table.from_pandas(chunk, schema=schema, preserve_index=False),
            os.path.join(path, f"part-{i:05d}.parquet"))
    return path


def gen_query_set(corpus: pd.DataFrame, seed: int = SEED) -> list[str]:
    """~60 deterministic queries per FIXTURES.md §2."""
    rng = np.random.default_rng(seed + 1)
    texts = corpus.loc[corpus["lang"] == "en", "text"]
    from collections import Counter
    df_count: Counter = Counter()
    for t in texts:
        df_count.update(set(t.split()))
    by_df = sorted(df_count.items(), key=lambda kv: (-kv[1], kv[0]))
    queries: list[str] = []
    # 20 single-term: 10 high-df, 10 low-df
    queries += [w for w, _ in by_df[:10]]
    queries += [w for w, _ in by_df[-10:]]
    # 20 multi-term co-occurring in >= 1 doc
    docs = list(texts)
    for _ in range(20):
        doc = docs[int(rng.integers(0, len(docs)))].split()
        k = int(rng.integers(2, 5))
        idx = rng.choice(len(doc), size=min(k, len(doc)), replace=False)
        queries.append(" ".join(doc[j] for j in sorted(idx)))
    # 10 planted phrases
    queries += PHRASES
    # 5 zero-hit (valid-looking words absent from corpus)
    queries += ["zebra quasar", "quixotic", "byzantine mosaic",
                "nebula syzygy", "quarterstaff"]
    # 5 containing OOV tokens (dropped per overlap_calculation.py:128-131)
    queries += ["the zzqqx", "water qqq111", "xx99zz", "river ∆∆", "ΩΩΩ light"]
    return queries
