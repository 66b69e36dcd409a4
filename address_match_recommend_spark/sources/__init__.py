from . import checkpoint, readers  # noqa: F401
