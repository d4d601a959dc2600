from . import genfeed, lake  # noqa: F401
