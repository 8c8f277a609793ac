from .engine import SearchEngine  # noqa: F401
