"""Waves 114-121 kernels: SymSpell distance/variants, skyline filter,
DuckDB-rounding/truncation helpers, moment limb recombination, local
truss support — brute-force duals, no Ray needed."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402


def _lev_ref(a: str, b: str) -> int:
    """Textbook DP levenshtein."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _rand_words(rng, n, alpha="abcd", lo=0, hi=7):
    return [
        "".join(rng.choice(list(alpha), size=rng.integers(lo, hi)))
        for _ in range(n)
    ]


def test_lev_le1_matches_dp():
    rng = np.random.default_rng(7)
    qs, vs = [], []
    for w in _rand_words(rng, 300, lo=0, hi=8):
        for v in _rand_words(rng, 3, lo=max(0, len(w) - 1), hi=len(w) + 2):
            if abs(len(w) - len(v)) <= 1:
                qs.append(w)
                vs.append(v)
    got = entry._lev_le1(np.array(qs, dtype=object), np.array(vs, dtype=object))
    want = np.array([min(_lev_ref(a, b), 2) for a, b in zip(qs, vs)])
    assert (got == want).all()


def test_del1_variants_complete():
    rng = np.random.default_rng(8)
    words = np.array(_rand_words(rng, 50, lo=1, hi=9), dtype=object)
    var, parent = entry._del1_variants(words)
    for i, w in enumerate(words):
        got = {v for v, p in zip(var, parent) if p == i}
        want = {w} | {w[:j] + w[j + 1 :] for j in range(len(w))}
        assert got == want, w


def test_symspell_blocking_complete():
    # two terms within lev distance 1 ALWAYS share a variant
    rng = np.random.default_rng(9)
    words = _rand_words(rng, 120, lo=1, hi=8)
    arr = np.array(words, dtype=object)
    var, parent = entry._del1_variants(arr)
    sets = [set() for _ in words]
    for v, p in zip(var, parent):
        sets[p].add(v)
    hits = 0
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            if _lev_ref(words[i], words[j]) <= 1:
                assert sets[i] & sets[j], (words[i], words[j])
                hits += 1
    assert hits > 0


def test_sky_filter_brute():
    rng = np.random.default_rng(10)
    for _ in range(20):
        x = rng.integers(0, 12, size=60).astype(np.int64)
        y = rng.integers(0, 12, size=60).astype(np.int64)
        pack = (x << 21) | y
        keep = entry._sky_filter(pack)
        for i in range(len(x)):
            dominated = any(
                x[j] >= x[i]
                and y[j] >= y[i]
                and (x[j] > x[i] or y[j] > y[i])
                for j in range(len(x))
            )
            assert keep[i] == (not dominated), (x[i], y[i])


def test_round_half_away_matches_duckdb():
    import duckdb

    vals = np.array(
        [-2.5, -1.5, -0.5, 0.5, 1.5, 2.5, -84042.5, 84042.5, 1.49, -1.49, 0.0]
    )
    got = entry._round_half_away(vals)
    want = [
        int(duckdb.sql(f"SELECT CAST(round(CAST({v!r} AS DOUBLE)) AS BIGINT)").fetchone()[0])
        for v in vals
    ]
    assert got.tolist() == want


def test_tdiv_truncates_toward_zero():
    import duckdb

    for a in [-7, -6, -1, 0, 1, 6, 7, 1001, -1001]:
        for b in [2, 3, -2, 7]:
            want = int(duckdb.sql(f"SELECT ({a})//({b})").fetchone()[0])
            assert entry._tdiv(a, b) == want, (a, b)


def test_moment_limb_recombination():
    rng = np.random.default_rng(11)
    d = rng.integers(-49_000, 49_000, size=5_000).astype(np.int64)
    d2 = d * d
    d3 = d2 * d
    q3, r3 = np.divmod(d3, 1 << 20)
    q4, r4 = np.divmod(d2, 1 << 20)
    want3 = sum(int(v) ** 3 for v in d)
    want4 = sum(int(v) ** 4 for v in d)
    got3 = (int(q3.sum()) << 20) + int(r3.sum())
    got4 = (int((q4 * q4).sum()) << 40) + (int((q4 * r4).sum()) << 21) + int(
        (r4 * r4).sum()
    )
    assert got3 == want3
    assert got4 == want4


def test_truss_support_local_brute():
    rng = np.random.default_rng(12)
    n_nodes = 30
    pairs = set()
    while len(pairs) < 80:
        a, b = rng.integers(0, n_nodes, size=2)
        if a != b:
            pairs.add((min(int(a), int(b)), max(int(a), int(b))))
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    sa, sb, _key, sup = entry._truss_support_local(a, b)
    adj = {i: set() for i in range(n_nodes)}
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    want = {(u, v): len(adj[u] & adj[v]) for u, v in pairs}
    got = {(int(u), int(v)): int(s) for u, v, s in zip(sa, sb, sup)}
    assert got == want
