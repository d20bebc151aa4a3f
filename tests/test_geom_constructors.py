"""Property tests for the polygon constructors (box/ngon/line) and
area/centroid — reference parity targets geometry.c:429-626."""

import math

import numpy as np

from spatialindex_ray import geom, ops
from spatialindex_ray.kernels import vec


def _sample_disk(ra, dec, r, n, seed=0):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    rr = np.sqrt(rng.uniform(0, 1, n)) * r
    lon = (ra + rr * np.cos(ang) / max(np.cos(np.radians(dec)), 1e-9)) % 360
    lat = np.clip(dec + rr * np.sin(ang), -90, 90)
    return lon, lat


def test_box_contains_center_and_respects_bounds():
    poly = geom.polygon_box(120.0, 30.0, width=6.0, height=4.0)
    cen = geom.radec_to_v3(120.0, 30.0)
    assert poly.contains(cen)
    lon, lat = _sample_disk(120.0, 30.0, 8.0, 4000)
    v = ops.xyz_from_lonlat(lon, lat)
    inside = poly.mask(v)
    # all inside points are within the bounding disk of the box corners
    corners = np.asarray(poly.verts)
    maxsep = max(
        float(vec.angsepu(np.asarray(cen), c)) for c in corners
    )
    sep = vec.angsepu(np.asarray(cen)[None, :], v[inside])
    assert (sep <= maxsep + 1e-9).all()
    assert inside.sum() > 0


def test_ngon_approximates_circle():
    r = 3.0
    poly = geom.polygon_ngon(45.0, -20.0, r=r, n=24)
    lon, lat = _sample_disk(45.0, -20.0, 4.0, 6000, seed=1)
    v = ops.xyz_from_lonlat(lon, lat)
    inside = poly.mask(v)
    cen = np.asarray(geom.radec_to_v3(45.0, -20.0))
    sep = vec.angsepu(cen[None, :], v)
    # inscribed ngon: inside => within r; points within 0.97r mostly inside
    assert (sep[inside] <= r + 1e-9).all()
    core = sep <= 0.97 * r * math.cos(math.pi / 24)
    assert inside[core].mean() > 0.99


def test_line_polygon_covers_segment_neighborhood():
    poly = geom.polygon_line(10.0, 5.0, 14.0, 7.0, r=0.5)
    # points on the segment are inside
    for t in np.linspace(0.05, 0.95, 7):
        lon = 10.0 + t * 4.0
        lat = 5.0 + t * 2.0
        v = geom.radec_to_v3(lon, lat)
        assert poly.contains(v), t
    # points far away are not
    assert not poly.contains(geom.radec_to_v3(20.0, 20.0))


def test_area_and_centroid():
    poly = geom.polygon_ngon(0.0, 0.0, r=5.0, n=64)
    area = geom.polygon_area(poly)
    # ngon area -> spherical cap area 2*pi*(1-cos r)
    cap = 2 * math.pi * (1 - math.cos(math.radians(5.0)))
    assert abs(area - cap) / cap < 0.02
    cen = geom.centroid(np.asarray(poly.verts))
    assert vec.angsepu(np.asarray(cen), np.asarray(geom.radec_to_v3(0.0, 0.0))) < 0.1


def test_hull_contains_all_points():
    rng = np.random.default_rng(9)
    for trial in range(5):
        ra0 = rng.uniform(0, 360)
        dec0 = rng.uniform(-60, 60)
        n = int(rng.integers(5, 40))
        ras = (ra0 + rng.uniform(-4, 4, n)) % 360
        decs = np.clip(dec0 + rng.uniform(-4, 4, n), -90, 90)
        poly = geom.polygon_hull(list(ras), list(decs))
        v = ops.xyz_from_lonlat(ras, decs)
        m = poly.mask(v)
        # all input points inside (or on) the hull
        x, y, z = v[:, 0], v[:, 1], v[:, 2]
        ok = np.ones(n, bool)
        for nm in poly.normals:
            ok &= (x * nm[0] + y * nm[1] + z * nm[2]) >= -1e-12
        assert ok.all()
        # hull is a valid convex polygon (constructor would raise otherwise)
        assert poly.n >= 3


def test_hemispherical():
    assert geom.hemispherical([geom.radec_to_v3(0, 0), geom.radec_to_v3(10, 5),
                               geom.radec_to_v3(350, -5)])
    assert not geom.hemispherical([geom.radec_to_v3(0, 0), geom.radec_to_v3(120, 0),
                                   geom.radec_to_v3(240, 0), geom.radec_to_v3(0, 80),
                                   geom.radec_to_v3(180, -80)])


def test_v3_convex_golden_parity():
    """Exact-port parity of htm_v3_convex vs the compiled reference
    (fixture regenerated per SURVEY §5.3 with tools/gen_pad_convex)."""
    import json
    import os

    fix = json.load(
        open(os.path.join(os.path.dirname(__file__), "fixtures", "pad_convex_golden.json"))
    )
    for case in fix["convex"]:
        verts = [tuple(float.fromhex(c) for c in v) for v in case["verts"]]
        res, degen = geom.v3_convex(verts)
        assert res == case["result"], case
        assert degen == case["degen"], case


def test_s2cpoly_pad_golden_parity():
    """Byte-identical padded-polygon vertices/edges/vsum vs the reference."""
    import json
    import os

    fix = json.load(
        open(os.path.join(os.path.dirname(__file__), "fixtures", "pad_convex_golden.json"))
    )
    for case in fix["pad"]:
        verts = [tuple(float.fromhex(c) for c in v) for v in case["verts"]]
        poly = geom.cpoly_from_v3(verts)
        r = float.fromhex(case["r"])
        if case["ec"] != 0:
            import pytest

            with pytest.raises(geom.RegionError):
                geom.s2cpoly_pad(poly, r)
            continue
        padded = geom.s2cpoly_pad(poly, r)
        n = len(verts)
        rows = [tuple(float.fromhex(c) for c in row) for row in case["out"]]
        for i in range(n):
            assert tuple(padded.verts[i]) == rows[i]
            assert tuple(padded.edges[i]) == rows[n + i]
        assert tuple(padded.vsum) == rows[2 * n]


def test_pad_grows_polygon():
    """Every point within r of the original polygon is inside the pad."""
    import numpy as np

    poly = geom.polygon_ngon(83.0, 22.0, 4.0, 5)
    padded = geom.s2cpoly_pad(poly, 1.5)
    rng = np.random.RandomState(3)
    # points just outside the original boundary but within r
    for v in poly.verts:
        assert padded.contains(v)
    lon = rng.uniform(75, 91, 4000)
    lat = rng.uniform(14, 30, 4000)
    from spatialindex_ray import ops

    xyz = ops.xyz_from_lonlat(lon, lat)
    inside_orig = poly.mask(xyz)
    inside_pad = padded.mask(xyz)
    assert (inside_pad | ~inside_orig).all() or (inside_orig <= inside_pad).all()
    # some ring points between the two boundaries exist
    assert inside_pad.sum() > inside_orig.sum()
