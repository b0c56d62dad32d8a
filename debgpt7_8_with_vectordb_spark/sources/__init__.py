from .registry import read, register_source  # noqa: F401
