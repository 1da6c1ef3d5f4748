"""Common-Crawl-style webpage synthesis + text extraction + skew handling.

The target data model (BASELINE.json:input_hint) is an Iceberg/parquet table
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data is allowed, so :func:`webpages` synthesizes it
deterministically at any scale: every value is a pure function of the row id
via splitmix64 mixing, so the output is identical regardless of partitioning,
batch boundaries, or core count (FIXTURES.md §1).

- ``html`` embeds ``text`` **verbatim** between fixed markers so extraction
  can be byte-identical per url — the per-row invariant the driver checks.
- hosts are Zipf-skewed: 3 hot hosts hold ~30% of rows (to exercise salting);
  the remaining rows spread over 997 cold hosts.
- a small fixed fraction of rows lands near/over the 1 MB key cap to
  exercise the guard (the reference *documents* the cap, README.md:14-15,
  but never enforces it; we do).

:func:`extract_text` is a fully vectorized Arrow kernel (offset math on the
string buffers, no per-row Python), honoring the "vectorized pandas/Arrow
UDFs (no per-row Python)" contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksketch.hashing import hash_col, splitmix64

MARK_OPEN = "<!--PBF-->"
MARK_CLOSE = "<!--/PBF-->"

_WORDS = np.array(
    """the of and to in is was for that with as his on be at by had not are but from or have
    an they which one you were all her she there would their we him been has when who will
    no more if out so up said what its about than into them can only other time new some
    could these two may first then do any like my now over such our man me even most made
    after also many before must through back years where much your way well down should
    because each just those people how too little state good very make world still own see
    men work long here get both between life being under never day same another know while
    last might great old year off come since against go came right used take three""".split(),
    dtype=object,
)

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
_LANGS = np.array(["en", "en", "en", "en", "en", "en", "en", "en", "en", "de", "de", "fr", "es", "zh", "hi", "ar", "pt"], dtype=object)
_BASE_TS_US = 1767225600_000000  # 2026-01-01T00:00:00Z in microseconds


def _mix(ids: np.ndarray, stream: int) -> np.ndarray:
    c = (stream * 0x9E3779B97F4A7C15 + 0xD6E8FEB8) & ((1 << 64) - 1)
    return splitmix64(ids.astype(np.uint64) ^ np.uint64(c))


def _gen_batch(ids: np.ndarray, seed: int, oversize_per_million: int = 200) -> pa.RecordBatch:
    ids = ids.astype(np.uint64) ^ np.uint64(seed)
    n = ids.shape[0]

    # ---- hosts: Zipf-skewed, 3 hot hosts ≈ 30% of rows ----
    r = (_mix(ids, 1) % np.uint64(1000)).astype(np.int64)
    cold = (_mix(ids, 2) % np.uint64(997)).astype(np.int64) + 3
    host_id = np.select([r < 150, r < 250, r < 300], [0, 1, 2], default=cold)
    hosts = np.char.add(np.char.add("h", np.char.zfill(host_id.astype("U4"), 4)), ".example.com")

    # ---- unique url per row ----
    hex_tag = np.char.mod("%016x", _mix(ids, 3).astype(object))
    urls = np.char.add(np.char.add(np.char.add("https://", hosts.astype("U32")), "/p"),
                       np.char.add(ids.astype("U20"), np.char.add("/", hex_tag.astype("U16"))))

    # ---- token counts: log-normal-ish in [4, 400] tokens ----
    u1 = (_mix(ids, 4) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u2 = (_mix(ids, 5) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    z = np.sqrt(-2.0 * np.log(u1 + 1e-300)) * np.cos(2.0 * np.pi * u2)
    n_tok = np.clip(np.exp(3.2 + 0.9 * z), 4, 400).astype(np.int64)

    # ---- tokens: flat vectorized sampling, joined per row via Arrow ----
    starts = np.concatenate(([0], np.cumsum(n_tok)))
    total = int(starts[-1])
    row_of = np.repeat(np.arange(n, dtype=np.int64), n_tok)
    j = np.arange(total, dtype=np.int64) - starts[row_of]
    tok_idx = (splitmix64(ids[row_of] * np.uint64(0x100000001B3) + j.astype(np.uint64) + np.uint64(1))
               % np.uint64(len(_WORDS))).astype(np.int64)
    flat = pa.array(_WORDS[tok_idx], pa.string())
    lists = pa.ListArray.from_arrays(pa.array(starts, pa.int32()), flat)
    text = pc.binary_join(lists, " ")

    # ---- oversize rows to exercise the 1 MB key guard ----
    osel = (_mix(ids, 6) % np.uint64(1_000_000)).astype(np.int64)
    over = osel < oversize_per_million // 2          # just over 1 MiB
    near = (osel >= oversize_per_million // 2) & (osel < oversize_per_million)  # just under
    if over.any() or near.any():
        t = text.to_pandas()
        pad_over = "z" * (2**20 + 64)
        pad_near = "y" * (2**20 - 4096)
        t[over] = t[over].str.slice(0, 64) + pad_over
        t[near] = t[near].str.slice(0, 64) + pad_near
        text = pa.array(t, pa.string())

    # ---- html wraps text verbatim between fixed markers ----
    title = np.char.add("Page ", ids.astype("U20"))
    html = pc.binary_join_element_wise(
        pa.array(np.char.add("<html><head><title>", title), pa.string()),
        pa.array(["</title></head><body>" + MARK_OPEN] * n, pa.string()),
        text,
        pa.array([MARK_CLOSE + "</body></html>"] * n, pa.string()),
        "",
    )

    lang = _LANGS[(_mix(ids, 7) % np.uint64(len(_LANGS))).astype(np.int64)]
    ts = (_BASE_TS_US + (_mix(ids, 8) % np.uint64(365 * 24 * 3600)).astype(np.int64) * 1_000_000)

    return pa.RecordBatch.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(ts, pa.timestamp("us")),
            pc.cast(html, pa.binary()),
            text,
            pa.array(lang, pa.string()),
        ],
        names=["url", "warc_ts", "html", "text", "lang"],
    )


def webpages(spark: SparkSession, n_rows: int, seed: int = 42,
             partitions: int | None = None, oversize_per_million: int = 200) -> DataFrame:
    """Deterministic synthetic Common-Crawl-style table of ``n_rows`` pages.

    Values are pure functions of the row id — the same (id, seed) yields the
    same row at any scale/parallelism, which is what lets correctness tests
    and the two-parallelism scaling benchmark share identical input."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            yield _gen_batch(ids, seed, oversize_per_million)

    return spark.range(0, n_rows, 1, parts).mapInArrow(gen, SCHEMA)


def synthetic_embeddings(spark: SparkSession, n_rows: int, dim: int = 64,
                         seed: int = 42, partitions: int = 64) -> DataFrame:
    """Deterministic synthetic embedding corpus ``(vec_id long, embedding
    array<float>)`` — the SINGLE generator shared by bench.py and the scale
    scripts (scripts/fd_scale.py, scripts/kmeans_scale.py), so the cached
    ``.bench_data/embeddings_N.parquet`` files are interchangeable.

    One independent Philox stream per id block (key ``[seed, first_id]``),
    with a planted decaying spectrum so matrix sketches (FD) have structure
    to capture.  Deterministic for the fixed ``repartition(partitions,
    'id')`` layout: each block's stream is keyed by its own first id."""

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            rng = np.random.Generator(np.random.Philox(key=[seed, int(ids[0])]))
            mat = rng.normal(size=(len(ids), dim)).astype(np.float32)
            mat *= np.linspace(3.0, 0.2, dim, dtype=np.float32)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()),
                 pa.FixedSizeListArray.from_arrays(
                     pa.array(mat.ravel(), pa.float32()), dim
                 ).cast(pa.list_(pa.float32()))],
                ["vec_id", "embedding"])

    return (spark.range(n_rows).repartition(partitions, "id")
            .mapInArrow(gen, "vec_id long, embedding array<float>"))


# ====================================================================
# byte-identical text extraction (input_hint invariant)
# ====================================================================

def _slice_strings(arr: pa.Array, starts: np.ndarray, stops: np.ndarray) -> pa.Array:
    """Vectorized variable-position substring: gathers byte ranges straight
    from the Arrow value buffer (pa.compute only slices by scalar offsets)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    abs_start = off[:-1].astype(np.int64) + starts
    lengths = np.maximum(stops - starts, 0)
    out_off = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
    row_of = np.repeat(np.arange(len(arr), dtype=np.int64), lengths)
    idx = np.arange(out_off[-1], dtype=np.int64) - out_off[row_of] + abs_start[row_of]
    return pa.StringArray.from_buffers(
        len(arr),
        pa.py_buffer(out_off.astype(np.int32).tobytes()),
        pa.py_buffer(data[idx].tobytes()),
    )


def extract_text_kernel(html: pa.Array) -> pa.Array:
    """binary html → the exact text bytes between the PBF markers.

    Operates directly on the binary buffers (binary and string arrays share
    the offsets+data layout) — no cast copy of the whole column; measured
    3× faster than cast-then-slice on the 500k-page corpus.  Assumes the
    embedded text is valid UTF-8 (true by construction of the corpus)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    is_bin = pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type)
    op = MARK_OPEN.encode() if is_bin else MARK_OPEN
    cl = MARK_CLOSE.encode() if is_bin else MARK_CLOSE
    a = pc.find_substring(html, op).to_numpy(zero_copy_only=False).astype(np.int64)
    b = pc.find_substring(html, cl).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.where(a >= 0, a + len(MARK_OPEN), 0)
    stops = np.where(b >= 0, b, 0)
    return _slice_strings(html, starts, stops)


def extract_text_expr(html_col: str | Column = "html") -> Column:
    """Pure-JVM marker extraction: ``locate`` + ``substr`` over the
    string-cast html — whole-stage codegen, no JVM→Python Arrow roundtrip
    (the roundtrip was 30% of the round-1 bench: the html column moved at a
    measured ~45 MB/s/core).  Edge semantics match
    :func:`extract_text_kernel` exactly: missing open marker → extract from
    the start; missing close marker → empty; close before open → empty.
    ``locate`` positions are char-based vs the kernel's byte offsets, but
    the extracted *content* is identical for any valid-UTF-8 html (ASCII
    markers align on char boundaries)."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    s = c.cast("string")
    o = F.locate(MARK_OPEN, s)   # 1-based; 0 when absent
    cl = F.locate(MARK_CLOSE, s)
    start = F.when(o > 0, o + len(MARK_OPEN)).otherwise(F.lit(1))
    stop = F.when(cl > 0, cl).otherwise(F.lit(1))
    return s.substr(start, F.greatest(stop - start, F.lit(0)))


def extract_text(df: DataFrame, html_col: str = "html", out: str = "extracted_text",
                 passthrough: list[str] | None = None, engine: str = "expr") -> DataFrame:
    """Append the extracted text column.

    ``engine='expr'`` (default): the codegen'd JVM expression path
    (:func:`extract_text_expr`) — the data never leaves the JVM; this is the
    scale path for the fixed-marker corpus.  ``engine='kernel'``: the
    vectorized Arrow kernel (:func:`extract_text_kernel`) — the general
    extractor seam to swap in arbitrary Python extraction logic (readability,
    boilerplate removal, ...), kept byte-identical to the expression on this
    corpus by the pytest invariant.

    ``passthrough`` limits which columns ride through the Python worker on
    the kernel path — JVM↔Python Arrow transfer is the dominant cost of
    binary-column ops (measured ~45 MB/s/core in this sandbox), so at scale
    ship only the columns the kernel and its consumer need and join the rest
    back by key if required.  Default: all columns (schema-preserving)."""
    cols = passthrough if passthrough is not None else [f.name for f in df.schema.fields]
    if html_col not in cols:
        cols = [*cols, html_col]
    src = df.select(*cols)
    if engine == "expr":
        return src.withColumn(out, extract_text_expr(html_col))
    if engine != "kernel":
        raise ValueError(f"unknown extract_text engine: {engine!r}")

    def fn(batches):
        for batch in batches:
            ext = extract_text_kernel(batch.column(html_col))
            yield pa.RecordBatch.from_arrays([*batch.columns, ext], names=[*batch.schema.names, out])

    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields)
    return src.mapInArrow(fn, f"{out_schema}, `{out}` string")


# ====================================================================
# key guard + skew salting
# ====================================================================

def enforce_key_limit(df: DataFrame, col: str, max_bytes: int = 2**20) -> DataFrame:
    """Drop keys beyond the documented 1 MB cap (reference README.md:14-15 —
    claimed there, enforced here). Pushed-down JVM filter, no Python."""
    return df.filter(F.octet_length(F.col(col).cast("string")) <= max_bytes)


def host_of(url_col: str | Column = "url") -> Column:
    return F.parse_url(F.col(url_col) if isinstance(url_col, str) else url_col, F.lit("HOST"))


def hot_hosts(df: DataFrame, url_col: str = "url", fraction: float = 0.01) -> list[str]:
    """Hosts holding more than ``fraction`` of all rows — the skew set.
    One small aggregation; result is broadcast-sized by construction."""
    total = df.count()
    rows = (
        df.select(host_of(url_col).alias("host"))
        .groupBy("host").count()
        .filter(F.col("count") > int(total * fraction))
        .collect()
    )
    return sorted(r["host"] for r in rows)


def salted_host(df: DataFrame, url_col: str = "url", hot: list[str] | None = None,
                n_salt: int = 16, out: str = "host_salted") -> DataFrame:
    """north_rule: "explicit salting for skewed hosts" — hot hosts fan out to
    ``host#0..n_salt-1`` sub-keys (uniform via url hash) so a groupBy/shuffle
    on the salted key has no straggler partition; cold hosts keep their key.
    Second-stage re-aggregation by true host merges the salted partials
    (sketches are mergeable, so this is exact)."""
    host = host_of(url_col)
    hot = hot or []
    salt = F.pmod(hash_col(F.col(url_col), 0x5A17), F.lit(n_salt).cast("long"))
    salted = F.when(host.isin(hot), F.concat(host, F.lit("#"), salt.cast("string"))).otherwise(host)
    return df.withColumn("host", host).withColumn(out, salted)


def unsalt(col: str | Column = "host_salted") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "#").getItem(0)


# ====================================================================
# URL canonicalization (crawl-dedup key normalization)
# ====================================================================

# query parameters that never identify content (tracking/attribution)
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "ref", "mc_cid", "mc_eid")


def canonical_url(col: str | Column) -> Column:
    """Canonical form of a URL for crawl dedup / grouping — the
    normalization pass that runs before url-keyed exact dedup so trivially
    different URLs of the same resource collapse to one key:

    1. fragment stripped (``#...``);
    2. scheme and host:port lowercased (path/query case preserved);
    3. default ports dropped (``:80`` for http, ``:443`` for https);
    4. trailing slashes stripped from the path;
    5. tracking params removed (``utm_*`` prefixes + ``TRACKING_PARAMS``),
       remaining params sorted bytewise, ``?`` dropped when none survive.

    Built entirely from ``substring_index``/``split``/``filter``/
    ``array_sort`` JVM expressions (codegen'd, no regex except the
    trailing-slash trim, no Python) with exact DuckDB counterparts
    (:func:`canonical_url_sql`) — the canonical key is engine-portable, so
    a dedup decision made here is reproducible anywhere.  NULL in → NULL
    out; scheme-less strings are treated as host-first."""
    u = F.col(col) if isinstance(col, str) else col
    nofrag = F.substring_index(u, "#", 1)
    pre_q = F.substring_index(nofrag, "?", 1)
    q = F.when(F.length(nofrag) > F.length(pre_q),
               F.substring(nofrag, F.length(pre_q) + 2, F.lit(1 << 30))
               ).otherwise(F.lit(""))
    has_scheme = F.locate("://", pre_q) > 0
    scheme_raw = F.substring_index(pre_q, "://", 1)
    scheme = F.lower(scheme_raw)
    rest = F.when(has_scheme,
                  F.substring(pre_q, F.length(scheme_raw) + 4, F.lit(1 << 30))
                  ).otherwise(pre_q)
    hostport = F.lower(F.substring_index(rest, "/", 1))
    path = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    host = (
        F.when((scheme == "http") & hostport.endswith(":80"),
               F.substring(hostport, 1, F.length(hostport) - 3))
        .when((scheme == "https") & hostport.endswith(":443"),
              F.substring(hostport, 1, F.length(hostport) - 4))
        .otherwise(hostport))
    path_clean = F.regexp_replace(path, "/+$", "")
    keep = F.filter(
        F.split(q, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~F.substring_index(p, "=", 1).isin(*TRACKING_PARAMS),
    )
    qs = F.array_join(F.array_sort(keep), "&")
    out = F.concat(
        F.when(has_scheme, F.concat(scheme, F.lit("://"))).otherwise(F.lit("")),
        host, path_clean,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(u.isNull(), F.lit(None).cast("string")).otherwise(out)


def canonical_url_sql(col: str) -> str:
    """DuckDB-dialect expression mirroring :func:`canonical_url` term for
    term (split_part == substring_index when the separator is absent)."""
    u = col
    nofrag = f"split_part({u}, '#', 1)"
    pre_q = f"split_part({nofrag}, '?', 1)"
    q = (f"CASE WHEN length({nofrag}) > length({pre_q}) "
         f"THEN substr({nofrag}, length({pre_q}) + 2) ELSE '' END")
    has_scheme = f"(instr({pre_q}, '://') > 0)"
    scheme_raw = f"split_part({pre_q}, '://', 1)"
    scheme = f"lower({scheme_raw})"
    rest = (f"CASE WHEN {has_scheme} THEN substr({pre_q}, length({scheme_raw}) + 4) "
            f"ELSE {pre_q} END")
    hostport = f"lower(split_part({rest}, '/', 1))"
    path = f"substr({rest}, length({hostport}) + 1)"
    host = (f"CASE WHEN {scheme} = 'http' AND ends_with({hostport}, ':80') "
            f"THEN substr({hostport}, 1, length({hostport}) - 3) "
            f"WHEN {scheme} = 'https' AND ends_with({hostport}, ':443') "
            f"THEN substr({hostport}, 1, length({hostport}) - 4) "
            f"ELSE {hostport} END")
    path_clean = f"regexp_replace({path}, '/+$', '')"
    tracking = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    keep = (f"list_filter(string_split({q}, '&'), p -> p <> '' "
            f"AND NOT starts_with(p, 'utm_') "
            f"AND NOT split_part(p, '=', 1) IN ({tracking}))")
    qs = f"array_to_string(list_sort({keep}), '&')"
    return (f"CASE WHEN {u} IS NULL THEN NULL ELSE "
            f"(CASE WHEN {has_scheme} THEN {scheme} || '://' ELSE '' END) "
            f"|| {host} || {path_clean} "
            f"|| (CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END) END")
