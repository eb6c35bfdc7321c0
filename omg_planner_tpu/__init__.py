"""omg_planner_tpu: a TPU-native goal-set CHOMP trajectory-optimization
framework (JAX/XLA/Pallas), built from scratch with the capabilities of
OMG-Planner (RSS 2020)."""

from .config import OMGConfig, HorizonParams  # noqa: F401

__version__ = "0.1.0"

# persistent XLA compilation cache: the remote-compile path on shared TPU
# pools is slow (minutes for the full plan program); caching makes every
# subsequent process start warm. Opt out with OMG_TPU_NO_CACHE=1.
import os as _os

if not _os.environ.get("OMG_TPU_NO_CACHE"):
    import jax as _jax

    _cache = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not _cache:
        # separate caches per backend: AOT artifacts are machine-specific.
        # jax.config reflects any jax.config.update("jax_platforms", ...)
        # done before this import (tests switch to cpu that way).
        _plat = (_jax.config.jax_platforms
                 or _os.environ.get("JAX_PLATFORMS", "default")).split(",")[0]
        _cache = _os.path.join(
            _os.path.dirname(_os.path.abspath(__file__)), "..",
            ".jax_cache", _plat)
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

# TPU matmul precision: XLA's default lowers f32 matmuls to bf16 passes,
# which breaks IK convergence tolerances (~1e-3) through the 7-link FK
# chain.  The framework's matmuls are tiny (4x4 chains, TxT operators), so
# full-f32 costs nothing; hot large matmuls can opt down locally.
try:
    _jax.config.update("jax_default_matmul_precision", "highest")
except Exception:
    pass
