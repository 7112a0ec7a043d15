"""Parallel runtime: device meshes, sharded batch solves, horizon partitioning.

The reference has NO distributed backend (SURVEY.md §5.8 — its only
parallelism is a 10-process ``multiprocessing.Pool`` for data collection).
Here parallelism is first-class and single-backend: a named
``jax.sharding.Mesh`` with XLA collectives.

Axes:
- ``traj``    trajectory data parallelism (replaces the process pool; P1)
- ``horizon`` time-axis partitioning of the associative-scan Riccati with
              boundary value-function exchange between shards (P6)
"""

from quattro_tpu.parallel.mesh import make_mesh, traj_sharding
from quattro_tpu.parallel.batch import batched_ilqr_solve, sharded_ilqr_solve
from quattro_tpu.parallel.horizon import sharded_suffix_value_functions, sharded_riccati_backward
from quattro_tpu.parallel.podscale import podscale_riccati_backward
from quattro_tpu.parallel import distributed

__all__ = [
    "make_mesh",
    "traj_sharding",
    "batched_ilqr_solve",
    "sharded_ilqr_solve",
    "sharded_suffix_value_functions",
    "sharded_riccati_backward",
    "podscale_riccati_backward",
    "distributed",
]
