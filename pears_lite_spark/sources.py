"""Source / sink operators from the reference's ingestion surface
(SURVEY.md §2.1), re-expressed as Spark reads + column algebra.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, \
    types as T

DEFAULT_LANG = "en"


def read_url_list(spark: SparkSession, path: str,
                  default_kwd: str = "home",
                  default_lang: str = DEFAULT_LANG) -> DataFrame:
    """S1: parse `url;keyword;lang` lines with defaults for missing
    fields (`/root/reference/app/utils.py:41-69`): a csv read plus
    coalesce — no imperative loop."""
    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("keyword", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    df = spark.read.csv(path, sep=";", schema=schema)
    return (df.filter(F.col("url").isNotNull() & (F.trim("url") != ""))
            .select(F.trim("url").alias("url"),
                    F.coalesce(F.nullif(F.trim("keyword"), F.lit("")),
                               F.lit(default_kwd)).alias("keyword"),
                    F.coalesce(F.nullif(F.trim("lang"), F.lit("")),
                               F.lit(default_lang)).alias("lang")))


_HREF_RE = re.compile(r"""<a\b[^>]*?href\s*=\s*["']([^"'#]+)["']""",
                      re.IGNORECASE)
_ANCHOR_EL_RE = re.compile(
    r"""<a\b[^>]*?href\s*=\s*["']([^"'#]+)["'][^>]*>(.*?)</a>""",
    re.IGNORECASE | re.DOTALL)
_TAG_SUB_RE = re.compile(r"<[^>]+>")


def _urljoin(base: str, href: str) -> str:
    from urllib.parse import urljoin
    return urljoin(base, href)


def extract_links_df(corpus_df: DataFrame) -> DataFrame:
    """S6: `<a href>` extraction + absolutization + explode
    (`/root/reference/app/indexer/htmlparser.py:54-75`) as an Arrow
    batch kernel over the html column. Returns (url, link)."""
    out_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("link", T.StringType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            us, ls = [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (html.decode("utf-8", "replace")
                        if isinstance(html, (bytes, bytearray)) else html)
                for href in _HREF_RE.findall(text or ""):
                    us.append(url)
                    ls.append(_urljoin(url, href))
            yield pd.DataFrame({"url": us, "link": ls})

    return corpus_df.select("url", "html").mapInPandas(kernel, out_schema)


def extract_anchors_df(corpus_df: DataFrame) -> DataFrame:
    """S6 extended with anchor text: per `<a href>` element emit
    (url, link, anchor) where link is absolutized against the page url
    and anchor is the element's tag-stripped, whitespace-normalized
    inner text. Same Arrow-batch shape as extract_links_df."""
    out_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("anchor", T.StringType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            us, ls, ans = [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (html.decode("utf-8", "replace")
                        if isinstance(html, (bytes, bytearray)) else html)
                for href, inner in _ANCHOR_EL_RE.findall(text or ""):
                    us.append(url)
                    ls.append(_urljoin(url, href))
                    ans.append(" ".join(_TAG_SUB_RE.sub(" ", inner).split()))
            yield pd.DataFrame({"url": us, "link": ls, "anchor": ans})

    return corpus_df.select("url", "html").mapInPandas(kernel, out_schema)


def anchor_text_rollup(anchors_df: DataFrame,
                       max_anchors: int = 3) -> DataFrame:
    """Per-target anchor-text aggregation — the classic web-IR doc
    enrichment signal (what the web calls a page): for each link target,
    total anchor count, distinct anchor strings, and the top
    `max_anchors` anchors by frequency (ties by string) joined with '|'.
    Returns (link, n_anchors, n_distinct_anchors, top_anchors).

    Scale shape: the (link, anchor) pre-aggregate has full map-side
    combine, so a celebrity target (a homepage linked from everywhere)
    collapses to its DISTINCT anchor strings before any window runs;
    the top-k window and the final rollup then operate on that reduced
    key space, shuffling on the same `link` key (exchange reuse). No
    collect_set of unbounded per-key state."""
    pairs = (anchors_df.groupBy("link", "anchor")
             .agg(F.count("*").alias("_cnt")))
    w = Window.partitionBy("link").orderBy(F.desc("_cnt"), F.asc("anchor"))
    ranked = pairs.withColumn("_r", F.row_number().over(w))
    return (ranked.groupBy("link").agg(
        F.sum("_cnt").cast("long").alias("n_anchors"),
        F.count("*").cast("long").alias("n_distinct_anchors"),
        F.concat_ws("|", F.transform(
            F.array_sort(F.collect_list(F.when(
                F.col("_r") <= max_anchors,
                F.struct("_r", "anchor")))),
            lambda s: s["anchor"])).alias("top_anchors")))


def canonical_url(u) -> "F.Column":
    """Crawl-dedup URL canonicalization as pure column algebra:
    lowercase scheme+host, strip the fragment, drop default ports
    (:80 http / :443 https), '/' for an empty path. Non-URL strings
    (no scheme) pass through unchanged. Every rule is a regexp both
    engines evaluate identically (contract: canonical_urls)."""
    u = F.col(u) if isinstance(u, str) else u
    no_frag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(
        no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(
        no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = (F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
            .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
            .otherwise(host))
    rest = F.regexp_extract(
        no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    rest = F.when(rest == "", "/").otherwise(rest)
    return (F.when(scheme == "", u)
            .otherwise(F.concat(scheme, F.lit("://"), host, rest)))


def _default_fetcher(url: str) -> bytes:
    """Real HTTP GET — import-gated; offline sandboxes inject a fake."""
    from urllib.request import urlopen
    with urlopen(url, timeout=10) as resp:  # pragma: no cover (no net)
        return resp.read()


def host_of(url_col) -> "F.Column":
    """Registrable host of a URL (column expression)."""
    return F.regexp_extract(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)


def fetch_urls_df(urls_df: DataFrame, fetcher=None,
                  rate_limit_per_sec: float = 2.0,
                  n_partitions: int | None = None) -> DataFrame:
    """S2 web fetch (`/root/reference/app/indexer/htmlparser.py:33-52`)
    as a distributed, politeness-aware operator.

    The reference fetches one URL at a time in a Flask request; here the
    url list is repartitioned BY HOST so each host's pages serialize
    through one task (per-host politeness), hosts fan out across
    executors, and each task token-buckets its request rate. The HTTP
    call itself is injectable (`fetcher(url) -> bytes`); the default
    urllib fetcher is import-gated for offline environments — tests and
    the contract inject a deterministic fake, so the distributed
    plumbing (host partitioning, rate limiting, error rows) is real and
    checked while no sandbox network access is assumed.

    Returns (url, ok:boolean, html:binary, err:string)."""
    fetch = fetcher or _default_fetcher
    out_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("err", T.StringType()),
    ])
    min_interval = 1.0 / max(rate_limit_per_sec, 1e-6)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time
        last = 0.0
        for pdf in batches:
            urls, oks, htmls, errs = [], [], [], []
            for url in pdf["url"]:
                wait = last + min_interval - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
                last = time.monotonic()
                try:
                    body = fetch(url)
                    urls.append(url); oks.append(True)
                    htmls.append(bytes(body)); errs.append(None)
                except Exception as e:  # noqa: BLE001 - error row, not crash
                    urls.append(url); oks.append(False)
                    htmls.append(None); errs.append(str(e)[:200])
            yield pd.DataFrame({"url": urls, "ok": oks, "html": htmls,
                                "err": errs})

    spark = urls_df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    return (urls_df.select("url")
            .repartition(n, host_of(F.col("url")))
            .mapInPandas(kernel, schema=out_schema))


def access_check(urls_df: DataFrame, robots_df: DataFrame) -> DataFrame:
    """S4 access check (`/root/reference/app/indexer/access.py:42-58`):
    join each url's host against the S3 robots gate; urls on blocked
    hosts (or hosts with no fetched robots.txt) are excluded before any
    fetch. Returns the allowed subset of urls_df."""
    gate = robots_gate(robots_df).filter(F.col("allowed")).select("site")
    return (urls_df.withColumn("_host", host_of(F.col("url")))
            .join(F.broadcast(gate),
                  F.col("_host") == F.col("site"), "left_semi")
            .drop("_host"))


def bfs_frontier(edges_df: DataFrame, seeds_df: DataFrame,
                 max_depth: int = 3) -> DataFrame:
    """S5: the crawler's frontier loop (`/root/reference/app/indexer/
    spider.py:37-58`) as iterative DataFrame joins: visited-set
    dedup == left_anti join; one shuffle per level, not per page.
    edges (src, dst), seeds (node) -> (node, depth of first reach)."""
    visited = seeds_df.select(F.col("node"),
                              F.lit(0).alias("depth"))
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (edges_df.join(frontier.select(F.col("node").alias("src")),
                             "src")
               .select(F.col("dst").alias("node")).distinct()
               .join(visited.select("node"), "node", "left_anti")
               .withColumn("depth", F.lit(d)))
        nxt = nxt.persist()
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def make_shareable_pod(docs_df: DataFrame, keyword: str,
                       pod_col: str = "source") -> DataFrame:
    """S15: pod share export rows `url;pod;lang`
    (`/root/reference/app/orchard/mk_urls_file.py:16-27`)."""
    return (docs_df.filter(F.col(pod_col) == keyword)
            .select(F.concat_ws(";", F.col("doc_id").cast("string"),
                                F.col(pod_col), F.col("lang"))
                    .alias("line")))


PAGERANK_SCALE = 10 ** 12


def pagerank(edges_df: DataFrame, iters: int = 5,
             damping_pct: int = 85, src: str = "src",
             dst: str = "dst", num_salts: int = 8,
             hot_threshold: int = 1_000_000) -> DataFrame:
    """Deterministic fixed-point PageRank by power iteration — the
    link-authority signal of a crawl graph (S5's BFS frontier gives
    reachability; this ranks it). Returns (node, rank_e12).

    All arithmetic is int64 micro-units (PAGERANK_SCALE = 1e12) with
    floor division, so the distributed per-node contribution sums are
    EXACT integers — bit-identical to the unrolled-CTE DuckDB oracle
    regardless of partitioning (the float formulation would drift in
    the last ulps per aggregation order). Per iteration: one edges><
    ranks join + one dst-keyed aggregate; dangling mass is one scalar
    aggregate redistributed uniformly (standard PageRank treatment).
    Multigraph semantics: parallel edges each carry weight.

    Hot-key guard: a hub page with >= `hot_threshold` outlinks would
    put its whole adjacency through one task of the per-iteration
    edges><ranks join; `dedup.prepare_salted_edges` salts such rows
    (degrees are static, so outdegree is also folded into the salted
    edges once, removing the second per-iteration src join) and hot
    rank rows replicate across the salts — exact, since the int64
    contribution sums are order-free."""
    from .dedup import prepare_salted_edges, replicate_salted
    # edges + outdegrees are referenced by two actions per iteration
    # (dangling scalar, rank materialization) — persist both so an
    # expensive upstream edges_df plan runs once, not ~2x iters times
    e = (edges_df.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .persist())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    deg.count()
    e_s, hot, n_hot = prepare_salted_edges(e, num_salts, hot_threshold)
    deg_s = replicate_salted(deg, "src", hot, n_hot, num_salts)
    e_w = e_s.join(deg_s, ["src", "_salt"]).persist()
    e_w.count()
    base = (100 - damping_pct) * PAGERANK_SCALE // (100 * n)
    ranks = nodes.withColumn("r", F.lit(PAGERANK_SCALE // n)).persist()
    ranks.count()
    for _ in range(iters):
        dang_row = (ranks.join(deg, ranks["node"] == deg["src"],
                               "left_anti").agg(F.sum("r"))).first()[0]
        dang_share = int(dang_row or 0) // n
        ranks_s = replicate_salted(ranks, "node", hot, n_hot, num_salts)
        contrib = (e_w.join(ranks_s,
                            (e_w["src"] == ranks_s["node"])
                            & (e_w["_salt"] == ranks_s["_salt"]))
                   .select("dst", F.expr("r div deg").alias("c")))
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        # integer floor division: expr-level `div`, not float `/`
        new_ranks = (nodes.join(summed, nodes["node"] == summed["dst"],
                                "left")
                     .select("node", F.expr(
                         f"{base}L + ({damping_pct}L * (coalesce(s, 0L) + "
                         f"{dang_share}L)) div 100").alias("r"))
                     .persist())
        new_ranks.count()          # materialize before releasing prev
        ranks.unpersist()
        ranks = new_ranks
    out = ranks.select("node", F.col("r").alias("rank_e12"))
    nodes.unpersist()
    deg.unpersist()
    e_w.unpersist()
    e.unpersist()
    return out


def encode_stego_pod_png(text: str) -> bytes:
    """S17 export side: hide a pod CSV in a PNG using the reference's
    pixel scheme (`/root/reference/app/pod_finder/index_pod_file.py:
    23-40`): each RGB pixel p encodes one character as
    chr((255-r)+(255-g)+(255-b)); one trailing 'transparency' pixel is
    appended and discarded on import. Canonical split: r absorbs up to
    255, then g, then b — any split decodes identically, this one is
    deterministic. Encoded as a 1-row 8-bit RGB PNG via the built-in
    codec (functions/codecs.py)."""
    import numpy as np
    from .functions.codecs import encode_png
    codes = [ord(c) for c in text]
    if any(c > 765 for c in codes):
        raise ValueError("stego scheme encodes code points <= 765 only")
    px = []
    for c in codes:
        a = min(c, 255)
        b = min(c - a, 255)
        d = c - a - b
        px.append((255 - a, 255 - b, 255 - d))
    px.append((255, 255, 255))  # transparency pixel, discarded on read
    arr = np.asarray(px, dtype=np.uint8).reshape(1, len(px), 3)
    return encode_png(arr)


def decode_stego_pod_png(png: bytes) -> str:
    """S17 import side, exact reference semantics: decode the PNG,
    drop the last pixel, chr((255-r)+(255-g)+(255-b)) per pixel."""
    import numpy as np
    from .functions.codecs import decode_png
    arr = decode_png(png)
    if arr.ndim == 2:  # grayscale: r=g=b
        arr = np.stack([arr] * 3, axis=-1)
    flat = arr.reshape(-1, arr.shape[-1])[:, :3].astype(np.int64)
    vals = (255 - flat).sum(axis=1)[:-1]
    return "".join(chr(int(v)) for v in vals)


def read_stego_pods(spark: SparkSession, path: str) -> DataFrame:
    """S17: PNG-steganography pod import, distributed: `binaryFile`
    scan (one row per .png, content never concatenated driver-side) ->
    per-file decode in an Arrow-batched kernel -> one row per CSV line
    -> `;`-split into the reference's record layout
    (`index_pod_file.py:11-20`: fields 1..6 = url, title, snippet,
    vector, freqs, cc). The decode fans out per file, so a directory of
    pod shares from many friends imports as one job."""
    from pyspark.sql import types as T

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"src": [], "line_no": [], "line": []}
            for src, content in zip(pdf["path"], pdf["content"]):
                text = decode_stego_pod_png(bytes(content))
                for i, line in enumerate(text.split("\n")):
                    if line:
                        rows["src"].append(src)
                        rows["line_no"].append(i)
                        rows["line"].append(line)
            yield pd.DataFrame(rows)

    lines = (spark.read.format("binaryFile").option("pathGlobFilter", "*.png")
             .load(path).select("path", "content")
             .mapInPandas(kernel, schema=T.StructType([
                 T.StructField("src", T.StringType()),
                 T.StructField("line_no", T.IntegerType()),
                 T.StructField("line", T.StringType())])))
    f = F.split(F.col("line"), ";")
    return lines.select(
        "src", "line_no",
        # n_fields surfaces truncated/malformed share lines instead of
        # letting them slide through as all-NULL records; cc coalesces
        # to False (a missing field is not an endorsement)
        F.size(f).alias("n_fields"),
        F.try_element_at(f, F.lit(2)).alias("url"),
        F.try_element_at(f, F.lit(3)).alias("title"),
        F.try_element_at(f, F.lit(4)).alias("snippet"),
        F.try_element_at(f, F.lit(5)).alias("vector"),
        F.try_element_at(f, F.lit(6)).alias("freqs"),
        F.coalesce(F.try_element_at(f, F.lit(7)) == "True",
                   F.lit(False)).alias("cc"))


def subscribe_pod(docs_df: DataFrame, imported_df: DataFrame) -> DataFrame:
    """S16: pod subscribe import — union new docs, existing urls win
    (`/root/reference/app/pod_finder/controllers.py:158-212`), i.e.
    left_anti dedup then unionByName."""
    fresh = imported_df.join(docs_df.select("doc_id"), "doc_id",
                             "left_anti")
    return docs_df.unionByName(fresh)


def robots_gate(robots_df: DataFrame, site_col: str = "site",
                txt_col: str = "robots") -> DataFrame:
    """S3: robots.txt gate (`/root/reference/app/indexer/access.py:7-40`)
    as window algebra over exploded lines — no per-row parser state.

    Faithful to the reference's (quirky) semantics: it collects every
    `Disallow:` rule in the `User-agent: *` section and returns blocked
    whenever ANY rule exists (`access.py:37-40` — the pattern match at
    :33-36 only prints). Returns (site, n_disallow, allowed)."""
    lines = robots_df.select(
        site_col, F.posexplode(F.split(F.col(txt_col), "\n")).alias("i", "l"))
    w = (Window.partitionBy(site_col).orderBy("i")
         .rowsBetween(Window.unboundedPreceding, 0))
    sec = lines.withColumn(
        "sec", F.last(F.when(F.col("l").contains("User-agent"),
                             F.col("l")), ignorenulls=True).over(w))
    dis = (sec.filter(F.col("l").contains("Disallow:")
                      & F.col("sec").contains("User-agent: *"))
           .groupBy(site_col).agg(F.count("*").alias("n_disallow")))
    return (robots_df.select(site_col)
            .join(dis, site_col, "left")
            .select(site_col,
                    F.coalesce("n_disallow", F.lit(0)).alias("n_disallow"),
                    (F.coalesce("n_disallow", F.lit(0)) == 0).alias("allowed")))


_DOC_BLOCK_RE = (r'(?s)<doc url="([^"]*)" title="([^"]*)">(.*?)</doc>')


def read_local_docs(spark: SparkSession, path: str) -> DataFrame:
    """S9: `<doc url="..." title="...">body</doc>` pseudo-XML reader
    (`/root/reference/app/indexer/controllers.py:201-219`,
    `app/utils.py:71-83`) — wholetext read + regexp_extract_all +
    explode; body whitespace-normalized. Returns (url, title, text)."""
    raw = spark.read.text(path, wholetext=True)
    blocks = raw.select(F.explode(F.regexp_extract_all(
        "value", F.lit(_DOC_BLOCK_RE), 0)).alias("b"))
    return blocks.select(
        F.regexp_extract("b", _DOC_BLOCK_RE, 1).alias("url"),
        F.regexp_extract("b", _DOC_BLOCK_RE, 2).alias("title"),
        F.trim(F.regexp_replace(
            F.regexp_extract("b", _DOC_BLOCK_RE, 3), r"\s+", " "))
        .alias("text"))


_BOOKMARK_RE = r'(?s)<A HREF="([^"]*)"[^>]*>([^<]*)</A>'


def read_bookmarks(spark: SparkSession, path: str) -> DataFrame:
    """S11: Netscape bookmarks-HTML scan (`/root/reference/app/utils.py:
    86-102`) — href+title pairs via regexp_extract_all + explode.
    Returns (url, title)."""
    raw = spark.read.text(path, wholetext=True)
    pairs = raw.select(F.explode(F.regexp_extract_all(
        "value", F.lit(_BOOKMARK_RE), 0)).alias("b"))
    return pairs.select(
        F.regexp_extract("b", _BOOKMARK_RE, 1).alias("url"),
        F.trim(F.regexp_extract("b", _BOOKMARK_RE, 2)).alias("title"))


def csv_to_docs(spark: SparkSession, path: str,
                source_name: str) -> DataFrame:
    """S10: CSV rows -> pseudo-documents (`/root/reference/app/indexer/
    controllers.py:224-262`): every row becomes url
    `<source>#<title> [<rownum>]`, text = 'col: val. ' concatenation."""
    df = spark.read.option("header", True).csv(path, sep=";")
    cols = df.columns
    body = F.concat_ws(" ", *[
        F.concat(F.lit(f"{c}: "), F.coalesce(F.col(c), F.lit("")),
                 F.lit(".")) for c in cols])
    # deterministic row number under ANY input partitioning (the
    # reference embeds the sequential row id in the pseudo-URL —
    # controllers.py:224-262; monotonically_increasing_id would be
    # partition-dependent): row_number over the row's own column values.
    # Global window = one-task sort, fine for this op's cardinality
    # (human-curated CSV imports, not corpus-scale data).
    w = Window.orderBy(*[F.col(c).asc_nulls_first() for c in cols])
    return df.select(
        F.concat(F.lit(source_name + "#row ["),
                 (F.row_number().over(w) - 1).cast("string"),
                 F.lit("]")).alias("url"),
        body.alias("text"))
