from . import normalize, text  # noqa: F401
