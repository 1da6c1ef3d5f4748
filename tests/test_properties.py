"""Property-based tests (hypothesis) for the pure kernels — merge laws,
hash parity, geometry — no SparkSession needed, so they run fast and explore
corners the example tests don't."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sparksketch.bloom import BloomFilterState, Level, _insert_batch
from sparksketch.cms import CMS
from sparksketch.config import BloomConfig, expected_n, optimal_k
from sparksketch.hashing import km_indices, set_bits, spark_xxhash64, xxh64
from sparksketch.hashing import test_bits as check_bits
from sparksketch.hll import HLL
from sparksketch.tdigest import TDigest


# ---------------- hashing ----------------

@given(st.binary(min_size=0, max_size=200), st.integers(min_value=0, max_value=2**64 - 1))
@settings(max_examples=200, deadline=None)
def test_xxh64_total_function(data, seed):
    h = xxh64(data, seed)
    assert 0 <= h < 2**64
    assert xxh64(data, seed) == h  # deterministic


@given(st.text(min_size=0, max_size=50))
@settings(max_examples=100, deadline=None)
def test_spark_xxhash64_string_bytes_equivalence(s):
    assert spark_xxhash64(s) == spark_xxhash64(s.encode("utf-8"))


@given(st.integers(min_value=1, max_value=20), st.integers(min_value=6, max_value=20))
@settings(max_examples=50, deadline=None)
def test_km_indices_in_range(k, log_m):
    m = 1 << log_m
    rng = np.random.default_rng(0)
    h1 = rng.integers(0, 2**64, 64, dtype=np.uint64)
    h2 = rng.integers(0, 2**64, 64, dtype=np.uint64)
    idx = km_indices(h1, h2, k, m)
    assert idx.shape == (64, k)
    assert int(idx.max()) < m
    bits = np.zeros(m // 64, dtype=np.uint64)
    set_bits(bits, idx)
    assert check_bits(bits, idx).all()  # zero false negatives at kernel level


# ---------------- geometry (reference formula parity) ----------------

@given(st.integers(min_value=8, max_value=26), st.sampled_from([12.0, 15.0, 19.0]))
@settings(max_examples=100, deadline=None)
def test_geometry_monotone(log_m, threshold):
    m = 1 << log_m
    n = expected_n(m, threshold)
    assert n == int(m / threshold)
    k = optimal_k(m, n)
    assert 1 <= k <= 16
    # doubling m doubles capacity, keeps k stable (±1 from rounding)
    assert abs(optimal_k(2 * m, expected_n(2 * m, threshold)) - k) <= 1


# ---------------- merge laws under random partitioning ----------------

@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=400),
       st.integers(min_value=2, max_value=5), st.randoms(use_true_random=False))
@settings(max_examples=25, deadline=None)
def test_bloom_merge_order_invariance(keys, n_parts, rnd):
    cfg = BloomConfig()
    rng = np.random.default_rng(7)

    def build(part_keys):
        st_ = BloomFilterState(cfg.tiers, 1, cfg.m0, cfg.threshold, cfg.rehash)
        st_.shards[0] = [[Level.fresh(0, cfg.m0, cfg.threshold)] for _ in range(cfg.tiers)]
        if part_keys:
            hs = []
            for t in range(cfg.tiers):
                h1 = np.array([spark_xxhash64(str(k), 100 + t) for k in part_keys], dtype=np.uint64)
                h2 = np.array([spark_xxhash64(str(k), 200 + t) for k in part_keys], dtype=np.uint64)
                hs.append((h1, h2))
            _insert_batch(st_.shards[0], hs, cfg.m0, cfg.threshold, cfg.rehash)
        return st_

    parts = [list() for _ in range(n_parts)]
    for k in keys:
        parts[rnd.randrange(n_parts)].append(k)
    states = [build(p) for p in parts]

    def fold(order):
        acc = BloomFilterState.from_bytes(states[order[0]].to_bytes())
        for i in order[1:]:
            acc.merge_into(BloomFilterState.from_bytes(states[i].to_bytes()))
        return acc.to_bytes()

    base = fold(list(range(n_parts)))
    order = list(range(n_parts))
    rnd.shuffle(order)
    assert fold(order) == base


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=500))
@settings(max_examples=50, deadline=None)
def test_hll_merge_equals_union(vals):
    arr = np.array(vals, dtype=np.uint64) if vals else np.empty(0, dtype=np.uint64)
    whole = HLL(10)
    whole.update_hashes(arr)
    a, b = HLL(10), HLL(10)
    a.update_hashes(arr[: len(arr) // 2])
    b.update_hashes(arr[len(arr) // 2 :])
    assert a.merge(b).to_bytes() == whole.to_bytes()


@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          min_value=-1e12, max_value=1e12), min_size=1, max_size=800))
@settings(max_examples=30, deadline=None)
def test_tdigest_quantile_within_range_and_n(vals):
    t = TDigest(100)
    t.update_values(np.array(vals))
    assert t.n == len([v for v in vals if not np.isnan(v)])
    q = t.quantile(0.5)
    assert min(vals) <= q <= max(vals)
    # serde roundtrip preserves quantiles exactly
    t2 = TDigest.from_bytes(t.to_bytes())
    assert t2.quantile(0.5) == t.quantile(0.5)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300),
       st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0, max_size=300))
@settings(max_examples=30, deadline=None)
def test_cms_merge_is_sum(xs, ys):
    def mk(v):
        c = CMS(3, 64)
        if v:
            a = np.array(v, dtype=np.uint64)
            c.update_hashes(a, a * np.uint64(3) + np.uint64(1))
        return c
    merged = mk(xs).merge(mk(ys))
    both = mk(xs + ys)
    assert (merged.counts == both.counts).all()
    assert merged.total == both.total


# ---------------- Misra-Gries (heavy hitters) ----------------

@given(st.lists(st.sampled_from([f"k{i}" for i in range(40)]), min_size=1, max_size=600),
       st.integers(min_value=2, max_value=32),
       st.integers(min_value=1, max_value=5), st.randoms(use_true_random=False))
@settings(max_examples=50, deadline=None)
def test_misra_gries_bounds_any_partitioning(keys, k, n_parts, rnd):
    """MG invariants under arbitrary partitioning + merge order: n exact,
    dec ≤ n/(k+1), lo ≤ true ≤ lo+dec for EVERY key, heavy keys present."""
    from sparksketch.topk import MisraGries
    true = {}
    for x in keys:
        true[x] = true.get(x, 0) + 1
    parts = [list() for _ in range(n_parts)]
    for x in keys:
        parts[rnd.randrange(n_parts)].append(x)
    sks = []
    for p in parts:
        s = MisraGries(k)
        if p:
            s.update_keys(np.array(p, dtype=object))
        sks.append(MisraGries.from_bytes(s.to_bytes()))
    order = list(range(n_parts))
    rnd.shuffle(order)
    acc = sks[order[0]]
    for i in order[1:]:
        acc = acc.merge(sks[i])
    assert acc.n == len(keys)
    assert acc.error_bound() <= acc.n // (k + 1)
    thr = acc.n / (k + 1)
    for key, cnt in true.items():
        lo, hi = acc.estimate(key)
        assert lo <= cnt <= hi, (key, lo, cnt, hi)
        if cnt > thr:
            assert lo > 0, key
    assert len(acc.topk()) <= k


@given(st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          min_value=-1e9, max_value=1e9), min_size=1, max_size=500))
@settings(max_examples=30, deadline=None)
def test_kll_serde_resume_reproducible(vals):
    """from_bytes(to_bytes(x)) continues the EXACT same stream: further
    identical updates produce byte-identical sketches."""
    from sparksketch.kll import KLL
    arr = np.array(vals)
    a = KLL(50, seed=9)
    a.update_values(arr)
    b = KLL.from_bytes(a.to_bytes())
    a.update_values(arr[::-1].copy())
    b.update_values(arr[::-1].copy())
    assert a.to_bytes() == b.to_bytes()


# ---------------- dedup kernels vs scalar reference ----------------

@given(st.lists(st.text(alphabet="abcdef ", min_size=0, max_size=60),
                min_size=1, max_size=30))
@settings(max_examples=25, deadline=None)
def test_shingle_window_hashes_match_scalar(texts):
    """The vectorized byte-rolling shingle hash must equal a scalar
    re-implementation row by row (offsets, short rows, empty rows)."""
    import pyarrow as pa

    from sparksketch.dedup import _shingle_window_hashes
    from sparksketch.hashing import splitmix64
    n = 5
    arr = pa.array(texts, pa.string())
    flat, starts, counts = _shingle_window_hashes(arr, n)
    B = np.uint64(0x100000001B3)
    # uint64 wraparound IS the hash arithmetic — silence only the intended
    # overflow so real numeric warnings elsewhere keep failing loudly
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            if data.size == 0:
                want = np.empty(0, dtype=np.uint64)
            elif data.size < n:
                h = np.uint64(0)
                for byte in data:
                    h = h * B + byte
                want = splitmix64(np.array([h], dtype=np.uint64))
            else:
                ws = []
                for j in range(data.size - n + 1):
                    h = np.uint64(0)
                    for byte in data[j : j + n]:
                        h = h * B + byte
                    ws.append(h)
                want = splitmix64(np.array(ws, dtype=np.uint64))
            got = flat[starts[i] : starts[i] + counts[i]]
            assert (got == want).all(), (i, t)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=0, max_size=200),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=25, deadline=None)
def test_simhash_kernel_matches_scalar(token_hashes, pad):
    """The 64-lane simhash bit-vote kernel vs a per-bit scalar count."""
    import pyarrow as pa

    from sparksketch.dedup import _simhash_kernel
    rows = [token_hashes, [], token_hashes[: len(token_hashes) // 2]][: pad + 1] or [token_hashes]
    batch = pa.RecordBatch.from_arrays(
        [pa.array(list(range(len(rows))), pa.int64()),
         pa.array(rows, pa.list_(pa.int64()))],
        names=["_id", "_th"])
    out = list(_simhash_kernel()([batch]))[0]
    got = out.column("simhash").to_pylist()
    for r, ths in enumerate(rows):
        sig = 0
        for j in range(64):
            ones = sum((np.uint64(h & (2**64 - 1)) >> np.uint64(j)) & np.uint64(1)
                       for h in np.array(ths, dtype=np.int64).view(np.uint64)) if ths else 0
            if ths and 2 * int(ones) - len(ths) > 0:
                sig |= 1 << j
        want = sig - (1 << 64) if sig >= (1 << 63) else sig
        assert got[r] == want, r


# --- canonical_url: idempotence + engine parity (via the DuckDB mirror,
# which is cheap per-example; Spark parity has its own fixed-case test) ---

_URL_CHARS = st.sampled_from(list("abcXYZ09.-_/:?&=#%~+ "))


@given(st.lists(_URL_CHARS, min_size=0, max_size=60).map("".join),
       st.sampled_from(["http://", "HTTPS://", "", "ftp://"]))
@settings(max_examples=40, deadline=None)
def test_canonical_url_idempotent(tail, scheme):
    import duckdb
    from sparksketch.webtext import canonical_url_sql
    u = scheme + tail
    once, twice = duckdb.sql(
        f"SELECT {canonical_url_sql('u')} AS c1, "
        f"{canonical_url_sql(canonical_url_sql('u'))} AS c2 "
        f"FROM (SELECT ? AS u)", params=[u]).fetchone()
    assert once == twice, (u, once, twice)


@given(st.lists(st.sampled_from(list("ab@.+-09xyz ()")), min_size=0,
                max_size=80).map("".join))
@settings(max_examples=60, deadline=None)
def test_scrub_pii_python_duckdb_agree(s):
    # Python re and DuckDB RE2 must agree on every input (Java regex parity
    # is covered by the Spark-side tests; this pins the pattern class to the
    # portable subset under fuzzing)
    import re

    import duckdb
    from sparksketch.textstats import PII_PATTERNS, scrub_pii_sql
    got = s
    for pat, repl in PII_PATTERNS:
        got = re.sub(pat, repl, got)
    want = duckdb.sql(f"SELECT {scrub_pii_sql('?')}", params=[s]).fetchone()[0]
    assert got == want, (s, got, want)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0,
                max_size=300),
       st.integers(min_value=1, max_value=6), st.randoms())
@settings(max_examples=60, deadline=None)
def test_theta_merge_order_invariance(vals, n_parts, rnd):
    # any partitioning, any merge order -> byte-identical sketch; estimate
    # exact below capacity
    import numpy as np

    from sparksketch.theta import Theta
    vals = list(vals)
    rnd.shuffle(vals)
    parts = [vals[i::n_parts] for i in range(n_parts)]
    sketches = []
    for p in parts:
        t = Theta(k=64)
        t.update_hashes(np.array(p, dtype=np.uint64))
        sketches.append(t)
    rnd.shuffle(sketches)
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.merge(s)
    ref = Theta(k=64)
    ref.update_hashes(np.array(vals, dtype=np.uint64))
    assert merged.to_bytes() == ref.to_bytes()
    distinct = len(set(vals))
    if distinct < 64:
        assert merged.estimate() == float(distinct)


@given(st.integers(min_value=0, max_value=60),
       st.integers(min_value=1, max_value=8),
       st.integers(min_value=2, max_value=6),
       st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_fd_spectral_guarantee_property(n, d, ell, seed):
    # any shape, any (ell, d) relation (including d < ell), any data scale:
    # 0 <= x'(A'A - B'B)x <= delta, delta <= ||A||_F^2/ell
    import numpy as np

    from sparksketch.fd import FrequentDirections
    rng = np.random.default_rng(seed)
    A = rng.normal(scale=rng.choice([1e-3, 1.0, 1e3]), size=(n, d))
    fd = FrequentDirections(ell=ell, d=d)
    step = int(rng.integers(1, 17))
    for i in range(0, n, step):
        fd.update_vectors(A[i : i + step])
    G = A.T @ A
    ev = np.linalg.eigvalsh(G - fd.cov())
    tol = 1e-9 * max(fd.fro2, 1e-30)
    assert fd.n == n
    assert ev.size == 0 or ev[0] >= -tol
    assert ev.size == 0 or ev[-1] <= fd.delta + tol
    assert fd.delta <= fd.fro2 / ell + tol


# ---------------- z-order layout (pure integer math) ----------------

@given(st.lists(st.tuples(st.integers(0, 2**10 - 1), st.integers(0, 2**10 - 1)),
                min_size=2, max_size=60, unique=True),
       st.integers(min_value=1, max_value=10))
@settings(max_examples=150, deadline=None)
def test_morton_bijective_and_monotone_per_axis(pairs, bits):
    from tests.test_layout import ref_morton
    m = (1 << bits) - 1
    masked = [(x & m, y & m) for x, y in pairs]
    zs = {p: ref_morton(list(p), bits) for p in set(masked)}
    # bijective on the masked domain
    assert len(set(zs.values())) == len(zs)
    # monotone in each axis with the other fixed
    for (x, y), z in zs.items():
        if (x + 1) & m > x and ((x + 1) & m, y) in zs:
            assert zs[((x + 1) & m, y)] > z
        if (y + 1) & m > y and (x, (y + 1) & m) in zs:
            assert zs[(x, (y + 1) & m)] > z


@given(st.integers(-2**40, 2**40), st.integers(0, 2**40),
       st.integers(1, 2**20), st.integers(min_value=1, max_value=16))
@settings(max_examples=300, deadline=None)
def test_bucket_shift_minimal_and_in_range(lo, span, probe, bits):
    from sparksketch.layout import _bucket_shift
    hi = lo + span
    s = _bucket_shift(lo, hi, bits)
    assert (hi - lo) >> s < (1 << bits)          # fits
    assert s == 0 or (hi - lo) >> (s - 1) >= (1 << bits)  # minimal
    v = lo + (probe % (span + 1))                # any in-range value maps in
    assert 0 <= (v - lo) >> s < (1 << bits)


@given(st.integers(min_value=1, max_value=10**6))
@settings(max_examples=300, deadline=None)
def test_keep_hex_top_exact_fraction(ppm):
    from sparksketch.graph import _keep_hex_top
    top = _keep_hex_top(ppm)
    assert len(top) == 8 and top == top.lower()
    # number of 8-hex prefixes <= top is exactly floor(ppm * 2^32 / 10^6)
    assert int(top, 16) + 1 == (ppm << 32) // 10**6
