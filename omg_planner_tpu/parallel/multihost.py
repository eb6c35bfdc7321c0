"""Multi-host orchestration helpers (DCN level).

The scene axis is embarrassingly parallel (SURVEY §5.8): each host stages
its own scene shard (SDF stacks, goal sets) from local assets, and the
global batch array is assembled with
``jax.make_array_from_process_local_data`` — no cross-host traffic beyond
the collectives inside each plan step (which ride ICI within a slice).

On a single-process setup these helpers degrade to plain stacking, so the
same driver script runs 1-host and N-host unchanged:

    mesh = make_scene_mesh(goal_parallel=2)
    problems = stage_local_scenes(cfg, my_scene_ids(total=100))
    batch = host_local_batch(mesh, problems)
    fn = make_sharded_plan(mesh, model, cfg)
    trajs, goal_idx, done = fn(batch)
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .batch import stack_problems


def make_scene_mesh(goal_parallel: int = 1) -> Mesh:
    """A (scene x goal) mesh over all addressable devices, scene axis
    outermost so scene shards stay host-local (DCN never sees goal
    collectives)."""
    devs = np.array(jax.devices())
    assert devs.size % goal_parallel == 0
    return Mesh(devs.reshape(devs.size // goal_parallel, goal_parallel),
                ("scene", "goal"))


def my_scene_ids(total: int) -> list[int]:
    """Contiguous scene-id shard for this process."""
    p = jax.process_index()
    n = jax.process_count()
    per = (total + n - 1) // n
    return list(range(p * per, min((p + 1) * per, total)))


def host_local_batch(mesh: Mesh, local_problems: Sequence):
    """Assemble the globally-sharded problem batch from per-host shards.

    Each process passes its local (already staged) problems; the scene
    dimension of the global array is the concatenation across processes.
    """
    local = stack_problems(local_problems)
    if jax.process_count() == 1:
        return local

    def to_global(x):
        spec = P("scene") if x.ndim >= 1 else P()
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))

    return jax.tree.map(to_global, local)
