from .build import build_index  # noqa: F401
