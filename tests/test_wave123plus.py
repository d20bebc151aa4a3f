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
