"""Waves 123+ kernels: Benford first-digit extraction / ppm constants and
the PII injection+redaction regexes — brute-force duals, no Ray needed."""

import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __ray_entry__ as entry  # noqa: E402


def test_first_digit_matches_string():
    rng = np.random.default_rng(123)
    x = rng.integers(1, 10**12, size=5000).astype(np.int64)
    got = entry._first_digit(x)
    want = np.array([int(str(v)[0]) for v in x.tolist()], np.int64)
    assert (got == want).all()
    # input must not be mutated
    x2 = x.copy()
    entry._first_digit(x)
    assert (x == x2).all()


def test_benford_ppm_constants():
    # floor(log10(1+1/d)*1e6): spot-check the canonical values and that the
    # floored ppm mass sums to just under 1e6.
    assert entry.BENFORD_PPM[1] == 301029
    assert entry.BENFORD_PPM[9] == 45757
    total = sum(entry.BENFORD_PPM.values())
    assert 999_990 <= total <= 1_000_000


def test_pii_regexes_on_injected_spans():
    # the three injected span shapes are each matched by exactly their own
    # class (no cross-class matches), for every doc_id residue pattern
    for did in [0, 3, 5, 7, 15, 21, 35, 105, 9999, 123456]:
        parts = []
        if did % 3 == 0:
            parts.append(f" contact user{did}@example.com now")
        if did % 5 == 0:
            parts.append(f" call +1-555-{did % 10000:04d}")
        if did % 7 == 0:
            parts.append(f" ssn 123-45-{did % 10000:04d}")
        t = "the fast key order" + "".join(parts)
        ne = len(re.findall(entry.PII_EMAIL_RE, t))
        npn = len(re.findall(entry.PII_PHONE_RE, t))
        ns = len(re.findall(entry.PII_SSN_RE, t))
        assert ne == (1 if did % 3 == 0 else 0), (did, t)
        assert npn == (1 if did % 5 == 0 else 0), (did, t)
        assert ns == (1 if did % 7 == 0 else 0), (did, t)


def test_pii_redaction_char_math():
    t = "x contact user21@example.com now ssn 123-45-0021"
    red = re.sub(entry.PII_EMAIL_RE, "[EMAIL]", t)
    red = re.sub(entry.PII_PHONE_RE, "[PHONE]", red)
    red = re.sub(entry.PII_SSN_RE, "[SSN]", red)
    assert red == "x contact [EMAIL] now ssn [SSN]"
    assert len(red) < len(t)


def test_haar_detail_brute():
    rng = np.random.default_rng(124)
    c = rng.integers(0, 1000, size=64).astype(np.int64)
    for lvl in (1, 2, 3):
        w = 1 << lvl
        want = []
        for k in range(64 // w):
            win = c[k * w : (k + 1) * w]
            want.append(int(win[: w // 2].sum() - win[w // 2 :].sum()))
        got = entry._haar_detail(c, lvl)
        assert got.tolist() == want


def test_haar_energy_invariants():
    # constant signal has zero detail energy at every level; a single
    # impulse at bucket b contributes |1| to every level's energy
    flat = np.full(64, 7, np.int64)
    for lvl in (1, 2, 3):
        assert np.abs(entry._haar_detail(flat, lvl)).sum() == 0
    imp = np.zeros(64, np.int64)
    imp[37] = 1
    for lvl in (1, 2, 3):
        assert np.abs(entry._haar_detail(imp, lvl)).sum() == 1


def test_semivariogram_band_thresholds():
    # band thresholds are chord^2 of 2deg and 4deg; a pair at angular
    # distance t lands in band floor(t/2deg) for t inside (0, 6)
    import math

    for t_deg, want_band in [(0.5, 0), (1.99, 0), (2.01, 1), (3.9, 1),
                             (4.05, 2), (5.9, 2)]:
        d2 = 4.0 * math.sin(math.radians(t_deg) / 2) ** 2
        thr = [4.0 * math.sin(k * entry.SEMIVAR_BAND_DEG * 0.5 * entry.RAD) ** 2
               for k in range(1, entry.SEMIVAR_NBANDS)]
        band = sum(d2 > x for x in thr)
        assert band == want_band, t_deg


def test_holt_recurrence_floor_semantics():
    # a sharp drop drives trend negative; verify the floor (not trunc)
    # convention and the fixed-point scale bookkeeping against a
    # rational-arithmetic reference with explicit floors
    from fractions import Fraction

    counts = np.array([100, 100, 100, 5, 5, 5, 200, 0, 0, 50], np.int64)
    level, trend = entry._holt_recurrence(counts)
    assert (trend < 0).any()
    s, a, b, d = (entry.HOLT_SCALE, entry.HOLT_ALPHA_NUM,
                  entry.HOLT_BETA_NUM, entry.HOLT_DEN)
    lv, tr = counts[0] * s, 0
    for t in range(1, len(counts)):
        new_lv = (counts[t] * s * a + (lv + tr) * (d - a)) // d
        tr = (b * (new_lv - lv) + (d - b) * tr) // d
        lv = new_lv
        assert level[t] == lv and trend[t] == tr, t


def test_did_identity_on_shifted_cells():
    # DiD over synthetic cells: treatment gains +delta post while control
    # is flat -> did == delta exactly (floored means cancel)
    mu = {(0, 0): 100, (0, 1): 100, (1, 0): 250, (1, 1): 321}
    did = (mu[(1, 1)] - mu[(1, 0)]) - (mu[(0, 1)] - mu[(0, 0)])
    assert did == 71


def test_robots_prefix_semantics():
    # '/A/1' must match /A/1 and /A/10../A/19 but not /A/21
    path = lambda m: f"/A/{m}"  # noqa: E731
    hits = [m for m in range(50)
            if path(m).startswith("/A/1")]
    assert hits == [1] + list(range(10, 20))


def test_tox_lexicon_scores_brute():
    texts = [
        "slow slow big scan",       # 5+5+2+1 = 13 -> flagged
        "the fast key",             # 0
        "filter big",               # 3+2 = 5
        "",                         # 0 (empty doc)
        "  slow  ",                 # 5 (whitespace runs)
    ]
    want = [13, 0, 5, 0, 5]
    for t, w in zip(texts, want):
        s = sum(entry.TOX_LEXICON.get(tok, 0) for tok in t.split())
        assert s == w


def test_replica_xor_fold_detects_single_flip():
    # XOR fold over a bucket flips iff any row hash changed
    import spatialindex_ray.ops as ops

    e = np.arange(2048, dtype=np.int64)
    c = (e * 7 % 1000).astype(np.int64)
    h1 = ops._splitmix64(e * np.int64(entry.REPLICA_ROW_MIX) + c)
    c2 = c.copy()
    c2[997] += 1
    h2 = ops._splitmix64(e * np.int64(entry.REPLICA_ROW_MIX) + c2)
    b = e // entry.REPLICA_BUCKET
    for bk in np.unique(b):
        m = b == bk
        f1 = np.bitwise_xor.reduce(h1[m])
        f2 = np.bitwise_xor.reduce(h2[m])
        assert (f1 != f2) == (997 in e[m]), bk


def test_gini_ppm_pure_split_is_zero():
    # perfectly separating split: left all positive, right all negative
    nl, pl, nr, pr = 100, 100, 200, 0
    num = pl * (nl - pl) * nr + pr * (nr - pr) * nl
    assert num == 0
    # maximally impure balanced split -> 500000 ppm (gini 0.5)
    nl, pl, nr, pr = 100, 50, 100, 50
    num = pl * (nl - pl) * nr + pr * (nr - pr) * nl
    ppm = 2_000_000 * num // (nl * nr * (nl + nr))
    assert ppm == 500_000


def test_simpson_flip_construction():
    # classic Simpson construction: treatment better within both segments,
    # worse pooled (confounded segment sizes)
    cells = {  # (seg, treat): (n, succ)
        (0, 0): (100, 10), (0, 1): (400, 50),   # seg0: 10% vs 12.5%
        (1, 0): (400, 200), (1, 1): (100, 55),  # seg1: 50% vs 55%
    }
    for g in (0, 1):
        n0, s0 = cells[(g, 0)]
        n1, s1 = cells[(g, 1)]
        assert s1 * n0 - s0 * n1 > 0  # treat wins within segment
    N0 = sum(v[0] for k, v in cells.items() if k[1] == 0)
    S0 = sum(v[1] for k, v in cells.items() if k[1] == 0)
    N1 = sum(v[0] for k, v in cells.items() if k[1] == 1)
    S1 = sum(v[1] for k, v in cells.items() if k[1] == 1)
    assert S1 * N0 - S0 * N1 < 0  # treat loses pooled -> flip


def test_seasonal_naive_gap_safety():
    # a missing day-7 leaves that day unscored (no row-lag confusion)
    cnt = {0: 10, 7: 12, 8: 99, 14: 15, 15: 100}
    scored = {d: abs(n - cnt[d - 7]) for d, n in cnt.items() if d - 7 in cnt}
    assert scored == {7: 2, 14: 3, 15: 1}


def test_no_duplicate_toplevel_names_in_entry():
    """Module-level name collisions silently rebind earlier oracles to
    later definitions (wave 115/117/118 SKYLINE/CHI2/RETENTION/_bm25
    collisions, fixed this session) — fail loudly on any recurrence."""
    import ast
    import collections

    path = Path(__file__).resolve().parents[1] / "__ray_entry__.py"
    tree = ast.parse(path.read_text())
    names = collections.Counter()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            names[node.name] += 1
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names[t.id] += 1
    dups = {k: v for k, v in names.items() if v > 1}
    assert not dups, dups


def test_textrank_rounds_brute():
    # tiny 3-node path graph a-b-c, weights 1: verify two rounds against
    # hand-computed fixed-point values
    w1 = ["a", "b", "b", "c"]
    w2 = ["b", "a", "c", "b"]
    wt = np.array([1, 1, 1, 1], np.int64)
    terms = ["a", "b", "c"]
    s = entry._textrank_rounds(w1, w2, wt, terms)
    base = entry.TEXTRANK_BASE
    keep = base - base * entry.TEXTRANK_DAMP_PPK // 1000
    # strength: a=1, b=2, c=1
    # round 1: M(a) = s(b)*1//2; M(b) = s(a)*1//1 + s(c)*1//1; M(c) = s(b)*1//2
    m_a = base * 1 // 2
    m_b = base + base
    s1_a = keep + entry.TEXTRANK_DAMP_PPK * m_a // 1000
    s1_b = keep + entry.TEXTRANK_DAMP_PPK * m_b // 1000
    assert s[1][0] == s1_a and s[1][1] == s1_b and s[1][2] == s1_a
    # round 2 uses round-1 scores
    m2_b = s1_a + s1_a
    s2_b = keep + entry.TEXTRANK_DAMP_PPK * m2_b // 1000
    assert s[2][1] == s2_b


def test_matched_filter_kernel_argmax():
    c = np.zeros(64, np.int64)
    c[10], c[11], c[12] = 5, 9, 5  # a (1,2,1)-shaped bump at t=10
    klen = len(entry.MF_KERNEL)
    score = sum(w * c[k: 64 - klen + 1 + k]
                for k, w in enumerate(entry.MF_KERNEL))
    t = int(np.argmin(-score))
    assert t == 10 and score[t] == 5 + 18 + 5


def test_jl_signs_deterministic_and_balanced():
    s = entry._jl_signs()
    assert s.shape == (entry.JL_K, entry.JL_DIMS)
    assert set(np.unique(s)) == {-1, 1}
    # deterministic across calls
    assert (s == entry._jl_signs()).all()
    # roughly balanced (splitmix avalanche): no row all-same-sign
    assert (np.abs(s.sum(axis=1)) < entry.JL_DIMS).all()


def test_jl_projection_preserves_dot_in_expectation():
    # projection of a vector against itself: ||Pv||^2 relates to K*||v||^2
    # only in expectation — here just verify the exact linear algebra
    rng = np.random.default_rng(131)
    v = rng.integers(-1000, 1000, size=entry.JL_DIMS).astype(np.int64)
    s = entry._jl_signs()
    proj = s @ v
    want = np.array([int((s[j] * v).sum()) for j in range(entry.JL_K)])
    assert (proj == want).all()


def test_lcp_minmax_order_statistic():
    # LCP of a set equals LCP(lexmin, lexmax)
    rng = np.random.default_rng(132)
    for _ in range(50):
        n = rng.integers(2, 12)
        strs = ["PRE" + "".join(rng.choice(list("abc"), size=rng.integers(0, 6)))
                for _ in range(n)]
        mn, mx = min(strs), max(strs)
        lcp_pair = 0
        for a, b in zip(mn, mx):
            if a != b:
                break
            lcp_pair += 1
        import os
        full = len(os.path.commonprefix(strs))
        assert lcp_pair == full, strs


def test_redirect_depth_brute():
    for x in [0, 1, 5, 10, 20, 40, 5120, 100, 625]:
        d, cur = 0, x
        while cur % 5 == 0 and cur > 0:
            d += 1
            cur //= 2
        # mirror of the vectorized loop
        arr = np.array([x], np.int64)
        dd = np.zeros(1, np.int64)
        cc = arr.copy()
        for _ in range(64):
            live = (cc % 5 == 0) & (cc > 0)
            if not live.any():
                break
            dd[live] += 1
            cc[live] //= 2
        assert dd[0] == d, x


def test_compass_sector_code_octants():
    # the (sign, sign, dominance) code distinguishes all 8 octants
    import itertools

    seen = set()
    for ang in range(0, 360, 15):
        e = np.cos(np.radians(ang))
        n = np.sin(np.radians(ang))
        code = 4 * (e >= 0) + 2 * (n >= 0) + (abs(e) >= abs(n))
        seen.add(int(code))
    assert seen == set(range(8))


def test_embedding_outlier_floor_div_negatives():
    # centroid of negative sums floors like numpy, not truncates
    s1, n = -7, 2
    assert s1 // n == -4  # python floor matches the engine
    # SQL dual formula: s1 // n - (s1 % n != 0 and s1 < 0)
    trunc = int(s1 / n)  # -3, what DuckDB // would give
    fixed = trunc - (1 if (s1 % -2 if False else s1 - trunc * n) != 0 and s1 < 0 else 0)
    assert fixed == -4


def test_cross_pair_combinatorics():
    # cross pairs = C(n,2) - sum C(nc,2) counts exactly the cross-customer
    # pairs of a multiset partitioned by customer
    import itertools

    counts = [3, 1, 2]  # three customers sharing a band
    n = sum(counts)
    total = n * (n - 1) // 2
    same = sum(c * (c - 1) // 2 for c in counts)
    # brute force
    labels = [i for i, c in enumerate(counts) for _ in range(c)]
    brute = sum(1 for a, b in itertools.combinations(labels, 2) if a != b)
    assert total - same == brute == 11


def test_pvm_decomposition_is_additive():
    # rate_effect is the residual by construction: vol + rate == s2 - s1
    for n1, s1, n2, s2 in [(10, 1000, 20, 2500), (5, -300, 3, 100),
                           (7, 699, 7, 699)]:
        avg1 = s1 // n1
        vol = (n2 - n1) * avg1
        rate = (s2 - s1) - vol
        assert vol + rate == s2 - s1


def test_anon_ladder_monotone_coarsening():
    # coarser levels can only merge classes: min size is non-decreasing,
    # group count non-increasing along the (100,True)->(100000,False) ladder
    rng = np.random.default_rng(136)
    cents = rng.integers(100, 50000, size=3000)
    dow = rng.integers(0, 7, size=3000)
    prev_groups, prev_min = None, None
    import collections

    for div, keep in entry.ANON_LEVELS:
        qi = (cents // div) * 8 + (dow if keep else 0)
        c = collections.Counter(qi.tolist())
        n_groups, mn = len(c), min(c.values())
        if prev_groups is not None and div >= prev_div and (prev_keep or not keep):
            assert n_groups <= prev_groups
        prev_groups, prev_min = n_groups, mn
        prev_div, prev_keep = div, keep


def test_hrw_not_is_order_reversing():
    rng = np.random.default_rng(137)
    h = rng.integers(0, 2**63, size=1000).astype(np.uint64) * 2 + 1
    a, b = h[:500], h[500:]
    flip = (~a < ~b)
    assert (flip == (a > b)).all()


def test_hrw_top3_matches_brute():
    import spatialindex_ray.ops as ops

    d = np.arange(50, dtype=np.int64) * 7 + 3
    nodes = np.arange(entry.HRW_NODES, dtype=np.int64)
    h = ops._splitmix64(
        (nodes[None, :] * entry.HRW_MIX + d[:, None]).reshape(-1)
    ).reshape(len(d), entry.HRW_NODES)
    neg = ~h
    order = np.lexsort((np.broadcast_to(nodes, h.shape), neg), axis=1)
    for i in range(len(d)):
        want = sorted(range(entry.HRW_NODES),
                      key=lambda n: (-int(h[i, n]), n))
        assert order[i, :3].tolist() == want[:3], i


def test_largest_remainder_allocation_exact():
    # floors + remainder top-up always sums exactly to the budget
    budget = 1000
    weights = [317, 9, 4441, 1, 1, 231]
    W = sum(weights)
    floors = [budget * w // W for w in weights]
    rems = [(budget * w % W, i) for i, w in enumerate(weights)]
    left = budget - sum(floors)
    alloc = floors[:]
    for _, i in sorted(rems, key=lambda x: (-x[0], x[1]))[:left]:
        alloc[i] += 1
    assert sum(alloc) == budget
    assert all(a >= f for a, f in zip(alloc, floors))


def test_peak_detection_brute():
    n = np.array([3, 5, 4, 4, 9, 2, 2, 8, 8], np.int64)
    mid = n[1:-1]
    nb = np.maximum(n[:-2], n[2:])
    prom = mid - nb
    keep = prom >= entry.PEAK_MIN_PROM
    got = list(zip(np.arange(1, len(n) - 1)[keep].tolist(), prom[keep].tolist()))
    # peaks: idx1 (5 > max(3,4): prom 1), idx4 (9 > max(4,2): prom 5)
    assert got == [(1, 1), (4, 5)]


def test_impossible_travel_pair_masking():
    # pairs only form within a user after the (user, ts, id) lexsort
    u = np.array([1, 1, 2, 2, 2], np.int64)
    e = np.array([10, 11, 20, 21, 22], np.int64)
    t = np.array([100, 200, 50, 60, 70], np.int64)
    order = np.lexsort((e, t, u))
    su = u[order]
    same = su[1:] == su[:-1]
    assert same.tolist() == [True, False, True, True]


def test_kwic_window_edges():
    toks = "a b merge c d e merge".split()
    # keyword at 1-based pos 3 and 7
    for pos, want_l, want_r in [(3, "a b", "c d e"), (7, "c d e", "")]:
        i = pos - 1
        lo = max(i - entry.KWIC_CTX, 0)
        hi = min(i + entry.KWIC_CTX + 1, len(toks))
        assert " ".join(toks[lo:i]) == want_l
        assert " ".join(toks[i + 1:hi]) == want_r


def test_assortativity_sums_symmetric_graph():
    # directed-both edges of an undirected path a-b-c: degrees a=1 b=2 c=1
    edges = [(0, 1), (1, 0), (1, 2), (2, 1)]
    deg = {0: 1, 1: 2, 2: 1}
    m = len(edges)
    sx = sum(deg[u] for u, v in edges)
    sy = sum(deg[v] for u, v in edges)
    sxy = sum(deg[u] * deg[v] for u, v in edges)
    assert (m, sx, sy, sxy) == (4, 6, 6, 8)
    assert sx == sy  # symmetry of the directed-both representation


def test_mmr_greedy_brute():
    # 4 candidates, hand-checkable: first pick = max rel; second pick
    # penalized by similarity to the first
    rel = {10: 100, 20: 90, 30: 85, 40: 10}
    dots = {(20, 10): 95, (10, 20): 95, (30, 10): 5, (10, 30): 5,
            (40, 10): 0, (10, 40): 0, (20, 30): 0, (30, 20): 0,
            (40, 20): 0, (20, 40): 0, (40, 30): 0, (30, 40): 0}
    selected, order = [], []
    remaining = {10, 20, 30, 40}
    for _ in range(3):
        best, best_score = None, None
        for c in sorted(remaining):
            maxdot = max((dots[(c, s)] for s in selected), default=0)
            score = rel[c] - maxdot
            if best_score is None or score > best_score:
                best, best_score = c, score
        selected.append(best)
        remaining.discard(best)
        order.append((best, best_score))
    # pick1 = 10 (rel 100); pick2: 20 scores 90-95=-5, 30 scores 85-5=80 -> 30
    # pick3: 20 still scores -5 (dominated by its similarity to 10) while
    # 40 scores 10-0=10 -> diversification promotes the weakly-relevant 40
    assert order[0] == (10, 100)
    assert order[1] == (30, 80)
    assert order[2] == (40, 10)


def test_tv_scaled_identity_and_symmetry():
    # identical distributions -> 0; disjoint supports -> 2*Ns*Nc
    g = {"a": 10, "b": 10}
    N_c = 20
    same = {"a": 5, "b": 5}
    N_s = 10
    tv = sum(abs(same.get(t, 0) * N_c - gt * N_s) for t, gt in g.items())
    assert tv == 0


def test_segmented_running_min_band_trick():
    # the MIN variant must SUBTRACT seg*band (descending bands) — the
    # additive form leaks earlier segments into later ones (caught by the
    # sf0.01 gate on mttr_report)
    rng = np.random.default_rng(142)
    seg = np.repeat(np.arange(6), rng.integers(1, 8, size=6))
    vals = rng.integers(0, 1000, size=len(seg)).astype(np.int64)
    band = 1001
    got = np.minimum.accumulate(vals - seg * band) + seg * band
    want = np.empty_like(vals)
    for s in np.unique(seg):
        m = seg == s
        want[m] = np.minimum.accumulate(vals[m])
    assert (got == want).all()


def test_sq8_floor_clip_negatives():
    step = 1 << entry.SQ8_SHIFT
    m = np.array([-step * 200, -step - 1, -1, 0, step - 1, step * 500],
                 np.int64)
    fq = m // step  # numpy floors
    q = np.clip(fq, -entry.SQ8_CLIP, entry.SQ8_CLIP)
    sat = (fq < -entry.SQ8_CLIP) | (fq > entry.SQ8_CLIP)
    assert fq.tolist() == [-200, -2, -1, 0, 0, 500]
    assert sat.tolist() == [True, False, False, False, False, True]
    assert (np.abs(m - q * step) >= 0).all()


def test_interval_union_sweep_brute():
    rng = np.random.default_rng(144)
    for _ in range(200):
        nc = int(rng.integers(10, 60))
        spans = []
        for j in range(entry.SPAN_K):
            s = int(rng.integers(0, nc))
            e = min(s + int(rng.integers(1, 25)), nc)
            spans.append((s, e))
        # brute: boolean cover array
        cover = np.zeros(nc, bool)
        for s, e in spans:
            cover[s:e] = True
        want = int(cover.sum())
        # sweep mirror
        spans_sorted = sorted(spans)
        covered, cur = 0, -1
        for s, e in spans_sorted:
            covered += max(e - max(s, cur), 0)
            cur = max(cur, e)
        assert covered == want


def test_log2_band_digitize_matches_bitlength():
    pow2 = 1 << np.arange(1, 63, dtype=np.int64)
    g = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 5000], np.int64)
    band = np.searchsorted(pow2, g, side="right")
    want = np.array([x.bit_length() - 1 for x in g.tolist()])
    assert (band == want).all()


def test_pair_shift_enumeration_complete():
    # the shift trick enumerates exactly the C(m,2) within-order pairs
    import itertools

    o = np.array([1, 1, 1, 2, 2, 3], np.int64)
    p = np.array([10, 20, 30, 10, 40, 50], np.int64)
    got = set()
    for k in range(1, 6):
        if k >= len(o):
            break
        same = o[k:] == o[:-k]
        for a, b in zip(p[:-k][same], p[k:][same]):
            got.add((int(a), int(b)))
    want = set()
    for key in (1, 2, 3):
        items = p[o == key].tolist()
        want |= set(itertools.combinations(items, 2))
    assert got == want


def test_bipartite_bfs_detects_odd_cycle():
    from collections import defaultdict, deque

    def check(edges):
        adj = defaultdict(list)
        for a, b in edges:
            adj[a].append(b)
            adj[b].append(a)
        color, odd = {}, 0
        start = min(adj)
        color[start] = 0
        dq = deque([start])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in color:
                    color[v] = color[u] ^ 1
                    dq.append(v)
                elif color[v] == color[u]:
                    odd = 1
        return odd

    assert check([(1, 2), (2, 3), (3, 1)]) == 1  # triangle
    assert check([(1, 2), (2, 3), (3, 4), (4, 1)]) == 0  # square


def test_ceil_form_matches_under_both_division_semantics():
    # (a + b - 1) // b == ceil(a/b) for positive ints under floor AND trunc
    import math

    for a in [1, 19, 20, 21, 95, 100, 137]:
        for b in [1, 2, 20, 100]:
            assert (a + b - 1) // b == math.ceil(a / b)


def test_rule_confidence_directionality():
    # conf(a->b) uses sup(a); the reverse rule uses sup(b)
    sup_ab, sup_a, sup_b = 4, 8, 16
    assert 1_000_000 * sup_ab // sup_a == 500_000
    assert 1_000_000 * sup_ab // sup_b == 250_000
