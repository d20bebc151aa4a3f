from . import vec, htm, healpix  # noqa: F401
