from . import webpages  # noqa: F401
