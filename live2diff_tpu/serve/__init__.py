from . import framepump  # noqa: F401
