from . import pose, spline, diff  # noqa: F401
