"""omg_planner_tpu: a TPU-native goal-set CHOMP trajectory-optimization
framework (JAX/XLA/Pallas), built from scratch with the capabilities of
OMG-Planner (RSS 2020)."""

from .config import OMGConfig, HorizonParams  # noqa: F401

__version__ = "0.1.0"
