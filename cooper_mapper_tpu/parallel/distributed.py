"""Multi-host execution glue.

The reference's "distribution" is ROS pub/sub between processes on one
machine (SURVEY.md §2.8); the TPU-native equivalent is the
``jax.distributed`` process group: N hosts each driving their local devices,
with one global mesh spanning all of them.  The sharded solvers in
parallel/batch.py are topology-agnostic — the same psum/batch-sharding code
runs on 1 chip, 1 host, or a multi-host pod slice; only the mesh changes.

Typical launch (per host):

    from cooper_mapper_tpu.parallel import distributed, mesh, batch
    distributed.initialize(coordinator="host0:1234", num_processes=2,
                           process_id=this_host_index)
    m = mesh.make_mesh()          # now spans ALL hosts' devices
    batch.sharded_odometry_solve(..., m)   # batch must be divisible by the
                                            # global device count

Scaling efficiency is measured by bench.py on the local slice; the
BASELINE >= 80% 2-host target is a pure data-parallel workload (no
cross-device traffic in the solves; the pose-graph psum is bytes-sized), so
the efficiency loss is only dispatch overhead.
"""

from __future__ import annotations

import jax


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Wrapper over jax.distributed.initialize with env-var fallback.

    With no arguments, defers to JAX's automatic cluster detection
    (COORDINATOR_ADDRESS / open-source cluster envs).  Safe to call once per
    process before any backend use.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally sharded batch owned by this process."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def is_multihost() -> bool:
    return jax.process_count() > 1
