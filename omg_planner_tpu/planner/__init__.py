from . import plan  # noqa: F401
