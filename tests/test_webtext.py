"""Synthetic webpages: determinism, extraction invariant, skew salting."""

from pyspark.sql import functions as F

from sparksketch.webtext import (
    enforce_key_limit,
    extract_text,
    hot_hosts,
    salted_host,
    unsalt,
    webpages,
)

N = 20_000


def _content_sum(df):
    # order-insensitive content fingerprint
    return df.select(F.expr("bit_xor(xxhash64(url, text, lang))").alias("s")).collect()[0].s


def test_webpages_shape_and_uniqueness(spark):
    df = webpages(spark, N, seed=42, partitions=8).cache()
    assert df.count() == N
    assert df.select("url").distinct().count() == N
    assert [f.name for f in df.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    assert df.schema["html"].dataType.simpleString() == "binary"
    assert df.schema["warc_ts"].dataType.simpleString() == "timestamp"


def test_webpages_deterministic_across_parallelism(spark):
    a = _content_sum(webpages(spark, 5000, seed=42, partitions=2))
    b = _content_sum(webpages(spark, 5000, seed=42, partitions=8))
    assert a == b
    c = _content_sum(webpages(spark, 5000, seed=7, partitions=8))
    assert c != a  # different seed → different corpus


def test_extraction_byte_identical(spark):
    """The input_hint per-row invariant: extract(html) == text for every url,
    on BOTH engines (JVM expression fast path and Arrow kernel)."""
    df = webpages(spark, 5000, seed=42, partitions=4)
    for engine in ("expr", "kernel"):
        ext = extract_text(df, engine=engine)
        bad = ext.filter(F.col("extracted_text") != F.col("text")).count()
        assert bad == 0, engine
        # and as raw bytes, not just string equality
        bad_bytes = ext.filter(
            F.encode(F.col("extracted_text"), "UTF-8") != F.encode(F.col("text"), "UTF-8")
        ).count()
        assert bad_bytes == 0, engine


def test_extraction_engines_agree_on_edge_cases(spark):
    """Missing/reordered markers and multibyte content: expression and
    kernel must produce identical output."""
    from sparksketch.webtext import MARK_CLOSE, MARK_OPEN
    rows = [
        (0, f"<html>{MARK_OPEN}héllo wörld ✓{MARK_CLOSE}</html>"),
        (1, "<html>no markers at all</html>"),
        (2, f"prefix{MARK_CLOSE}close only"),
        (3, f"open only{MARK_OPEN}tail"),
        (4, f"{MARK_CLOSE}reversed{MARK_OPEN}x"),
        (5, f"{MARK_OPEN}{MARK_CLOSE}"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id long, h string").select(
        "id", F.encode("h", "UTF-8").alias("html"))
    a = {r.id: r.extracted_text for r in extract_text(df, engine="expr").collect()}
    b = {r.id: r.extracted_text for r in extract_text(df, engine="kernel").collect()}
    assert a == b
    assert a[0] == "héllo wörld ✓" and a[1] == "" and a[3] == "" and a[5] == ""


def test_host_skew_and_salting(spark):
    df = webpages(spark, N, seed=42, partitions=8).cache()
    hot = hot_hosts(df, fraction=0.04)
    assert hot == ["h0000.example.com", "h0001.example.com", "h0002.example.com"]
    salted = salted_host(df, hot=hot, n_salt=16).cache()
    counts = {r.host_salted: r["count"] for r in salted.groupBy("host_salted").count().collect()}
    # hottest raw host ≈ 15% of rows; after salting no key exceeds ~2%
    assert max(counts.values()) < N * 0.025
    # salted keys reassemble to true hosts exactly
    back = (
        salted.groupBy(unsalt("host_salted").alias("host2")).count()
        .withColumnRenamed("count", "n2")
    )
    orig = salted.groupBy("host").count()
    joined = orig.join(back, orig.host == back.host2)
    assert joined.filter(F.col("count") != F.col("n2")).count() == 0


def test_key_guard_drops_oversize(spark):
    df = webpages(spark, 50_000, seed=42, partitions=8).cache()
    over = df.filter(F.octet_length("text") > 2**20).count()
    assert over > 0  # generator produces over-limit rows
    kept = enforce_key_limit(df, "text")
    assert kept.count() == 50_000 - over
    assert kept.filter(F.octet_length("text") > 2**20).count() == 0


def test_canonical_url_edges_and_duckdb_parity(spark):
    import duckdb
    from sparksketch.webtext import canonical_url, canonical_url_sql
    vals = [
        "HTTP://ExAmPle.COM:80/",                                   # ports + case + slash
        "https://A.com:443/x/?utm_source=1&z=2&a=3#frag",           # tracking + sort + frag
        "example.com/Path/?gclid=1&keep=2",                         # scheme-less
        "https://a.com/?utm_x=1&fbclid=2",                          # all params dropped
        "https://a.com:4433/x",                                     # non-default port kept
        "http://a.com:443/x",                                       # :443 not default for http
        "https://a.com/p?a",                                        # valueless param kept
        "https://a.com/p?",                                         # empty query dropped
        "https://a.com/CaseSensitive/Path",                         # path case preserved
        "://weird",                                                 # empty scheme
        "https://a.com/a#b#c",                                      # first # wins
        "",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "u string")
    got = [r.c for r in df.select(canonical_url("u").alias("c")).collect()]
    assert got[0] == "http://example.com"
    assert got[1] == "https://a.com/x?a=3&z=2"
    assert got[2] == "example.com/Path?keep=2"
    assert got[3] == "https://a.com"
    assert got[4] == "https://a.com:4433/x"
    assert got[5] == "http://a.com:443/x"
    assert got[6] == "https://a.com/p?a"
    assert got[7] == "https://a.com/p"
    assert got[8] == "https://a.com/CaseSensitive/Path"
    assert got[10] == "https://a.com/a"
    want = [duckdb.sql(
        f"SELECT {canonical_url_sql('u')} FROM (SELECT ? AS u)", params=[v]
    ).fetchone()[0] for v in vals]
    assert got == want
    # NULL in → NULL out on both engines
    ndf = spark.createDataFrame([(None,)], "u string")
    assert ndf.select(canonical_url("u").alias("c")).collect()[0].c is None
    assert duckdb.sql(f"SELECT {canonical_url_sql('CAST(NULL AS VARCHAR)')}").fetchone()[0] is None
