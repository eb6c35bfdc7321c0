from . import sdf, chomp, learner  # noqa: F401
