from . import panda  # noqa: F401
