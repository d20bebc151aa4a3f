"""Planner conformance: constraint strings byte-identical to the captured
reference CLI output (80 fuzzed cone/polygon queries, HTM + HPX), plus
range-set well-formedness and cover-superset property tests."""

import json
import math
import os

import numpy as np
import pytest

from spatialindex_ray import SpatialIndex, cover, geom
from spatialindex_ray.kernels import healpix, htm, vec

FIX = json.load(
    open(os.path.join(os.path.dirname(__file__), "fixtures", "reference_conformance.json"))
)
si = SpatialIndex()


@pytest.mark.parametrize("case", FIX["queries"], ids=lambda c: f"{c['type']}-{c['mode']}-L{c['level']}")
def test_constraint_strings_byte_identical(case):
    mode = 0 if case["mode"] == "HTM" else 1
    colname = "htmind" if mode == 0 else "hpxind"
    if case["type"] == "cone":
        ra, dec, rad = case["args"]
        res = si.cone_search(ra, dec, rad, mode=mode, level=case["level"],
                             colname=colname, encoding=0)
    else:
        ra = case["args"][0::2]
        dec = case["args"][1::2]
        res = si.polygon_search(len(ra), ra, dec, mode=mode, level=case["level"],
                                colname=colname, encoding=0)
    assert res["status"] == 0
    assert res["index_constraint"] == case["index_constraint"]
    assert res["geom_constraint"] == case["geom_constraint"]


def test_level_cap():
    res = si.cone_search(10, 10, 1, level=21)
    assert res["status"] == 1


def test_nonconvex_polygon_rejected():
    ra = [0.0, 2.0, 0.5, 2.0]
    dec = [0.0, 0.0, 0.5, 1.0]
    res = si.polygon_search(4, ra, dec)
    assert res["status"] == 1


def _wellformed(ranges):
    for i, (lo, hi) in enumerate(ranges):
        assert lo <= hi
        if i > 0:
            assert lo > ranges[i - 1][1]


def test_htm_ranges_wellformed_and_superset():
    """Uncompressed HTM cover: sorted, disjoint, non-adjacent; every point
    passing the exact predicate has its cell inside the ranges."""
    rng = np.random.default_rng(3)
    for trial in range(10):
        ra = rng.uniform(0, 360)
        dec = np.degrees(np.arcsin(rng.uniform(-1, 1)))
        rad = rng.choice([0.2, 1.0, 5.0])
        level = 7
        cone = geom.Cone(ra, dec, rad)
        ranges = cover.htm_circle_ranges(cone.center, rad, level)
        _wellformed(ranges)
        for i, (lo, hi) in enumerate(ranges):
            if i > 0:
                assert lo > ranges[i - 1][1] + 1  # non-adjacent after merge
        # sample points inside the cone
        n = 500
        ang = rng.uniform(0, 2 * np.pi, n)
        r = np.sqrt(rng.uniform(0, 1, n)) * rad
        lon_off = r * np.cos(ang) / np.cos(np.radians(dec))
        lat_off = r * np.sin(ang)
        plon = (ra + lon_off) % 360
        plat = np.clip(dec + lat_off, -90, 90)
        v = vec.normalize(vec.sc_to_v3(plon, plat))
        inside = cone.mask(v)
        ids = htm.v3_id(v, level)[inside]
        arr = cover.ranges_to_array(ranges)
        idx = np.searchsorted(arr[:, 0], ids, side="right") - 1
        assert (idx >= 0).all()
        assert (ids <= arr[idx, 1]).all()


def test_hpx_ranges_superset():
    rng = np.random.default_rng(4)
    for trial in range(6):
        ra = rng.uniform(0, 360)
        dec = np.degrees(np.arcsin(rng.uniform(-1, 1)))
        rad = rng.choice([0.3, 2.0])
        level = 7
        cone = geom.Cone(ra, dec, rad)
        ranges = cover.hpx_cone_ranges(level, ra, dec, rad)
        n = 500
        ang = rng.uniform(0, 2 * np.pi, n)
        r = np.sqrt(rng.uniform(0, 1, n)) * rad
        plon = (ra + r * np.cos(ang) / np.cos(np.radians(dec))) % 360
        plat = np.clip(dec + r * np.sin(ang), -90, 90)
        v = vec.normalize(vec.sc_to_v3(plon, plat))
        inside = cone.mask(v)
        ids = healpix.sky2hpx(level, plon, plat)[inside]
        arr = cover.ranges_to_array(ranges)
        idx = np.searchsorted(arr[:, 0], ids, side="right") - 1
        assert (idx >= 0).all()
        assert (ids <= arr[idx, 1]).all()


def test_gap_compress_bound():
    """Compressed total cells <= 1.3x covered total (maxpct=30)."""
    rng = np.random.default_rng(5)
    for trial in range(8):
        ra = rng.uniform(0, 360)
        dec = np.degrees(np.arcsin(rng.uniform(-1, 1)))
        cone = geom.Cone(ra, dec, 1.0)
        ranges = cover.htm_circle_ranges(cone.center, 1.0, 8)
        total = sum(hi - lo + 1 for lo, hi in ranges)
        comp = cover.gap_compress(ranges)
        newtotal = sum(hi - lo + 1 for lo, hi in comp)
        assert newtotal <= math.ceil(total * 1.3) + 1
        assert len(comp) <= len(ranges)
        _wellformed(comp)


def test_ellipse_cover_superset():
    rng = np.random.default_rng(6)
    for trial in range(4):
        ra = rng.uniform(0, 360)
        dec = np.degrees(np.arcsin(rng.uniform(-0.9, 0.9)))
        ell = geom.Ellipse.from_center(ra, dec, a=1.2, b=0.5, angle=30.0)
        ranges = cover.htm_ellipse_ranges(ell, 7)
        _wellformed(ranges)
        n = 400
        plon = (ra + rng.uniform(-1.5, 1.5, n)) % 360
        plat = np.clip(dec + rng.uniform(-1.5, 1.5, n), -90, 90)
        v = vec.normalize(vec.sc_to_v3(plon, plat))
        inside = ell.mask(v)
        ids = htm.v3_id(v, 7)[inside]
        arr = cover.ranges_to_array(ranges)
        if len(ids):
            idx = np.searchsorted(arr[:, 0], ids, side="right") - 1
            assert (idx >= 0).all()
            assert (ids <= arr[idx, 1]).all()
