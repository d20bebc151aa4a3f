"""spatialindex_ray — a from-scratch Ray-Data-native spatial indexing,
spatial-join and tiling engine with the query capabilities of
Caltech-IPAC/SpatialIndex, rebuilt on ray.data.Dataset + vectorized NumPy
kernels over zero-copy Arrow batches.

Layout:
    kernels/   vectorized HTM / HEALPix / vector math (bit-exact vs reference)
    geom.py    sky regions (cone / convex polygon / ellipse) + exact predicates
    cover.py   region -> sorted cell-id range decomposition (the planner)
    sqlcompat. byte-identical index/geom SQL constraint rendering
    spatial_index.py  drop-in SpatialIndex Python API (cone_search/polygon_search)
    ops.py     Dataset -> Dataset stages (encode, semi-join, cell join, knn, tiles)
    pipelines. end-to-end pipeline builders + webpages synthesis
    state/     manifest / checkpoint / lineage helpers
"""

__version__ = "0.1.0"

# Keep glibc from mmap()ing large NumPy temporaries: mmap'd blocks are
# returned to the OS on free, so every vectorized batch re-faults fresh
# pages — measured 10-30x slowdowns under host memory pressure. Raising the
# mmap/trim thresholds keeps big buffers on the reusable heap, giving
# steady-state workers (Ray actor/task processes) stable throughput. Safe
# no-op where unavailable.
try:  # pragma: no cover - linux/glibc only
    import ctypes as _ctypes

    _libc = _ctypes.CDLL("libc.so.6")
    _libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
    _libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
except Exception:
    pass

try:  # public API surface; kernels usable standalone during bootstrap
    from .spatial_index import SpatialIndex  # noqa: F401
except ImportError:  # pragma: no cover
    pass

# Ray workers may be launched before this repo lands on sys.path (callers
# ray.init() from an arbitrary cwd, then import us). Ship the library by
# value inside task closures so workers never need to import it from disk.
try:  # pragma: no cover - environment-dependent
    import sys as _sys

    from ray import cloudpickle as _rcp

    _rcp.register_pickle_by_value(_sys.modules[__name__])
except Exception:
    pass
