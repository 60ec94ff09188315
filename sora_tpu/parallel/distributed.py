"""Multi-host (DCN) scaffolding: jax.distributed-aware mesh construction
and host-local -> global array assembly.

The reference has no multi-node story (SURVEY §2.9 P7: its backend is
PCIe DMA + shared memory inside one box); this module supplies the scale
dimension the TPU framework adds: each host feeds its radios'/rings'
sample streams into the process-local shards of one global array, the
global mesh spans all hosts, and ICI/DCN collectives inside the jitted
pipeline do the rest (halo exchange over `sp`, gathers over `dp`).

Usage (per process)::

    from sora_tpu.parallel import distributed as dist
    dist.initialize(coordinator="host0:9999", num_processes=2,
                    process_id=rank)
    mesh = dist.global_mesh(dp=2)
    xg = dist.from_process_local(x_local, mesh, P("dp", "sp"))
    out = rx_pipeline_sharded(xg, mesh, rate)
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up jax.distributed.  With no arguments, relies on the
    environment (JAX_COORDINATOR_ADDRESS / cloud autodetection)."""
    import jax

    # NB: must run before anything touches the XLA backend, so the guard
    # inspects the distributed client state rather than jax.process_count()
    # (which would itself initialize the backend)
    from jax._src import distributed as _internal
    if getattr(_internal.global_state, "client", None) is not None:
        return                       # already initialized
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_mesh(dp: int | None = None):
    """(dp, sp) mesh over every device of every process.  By default one
    ``dp`` row per host so each host's streams stay host-local and only
    the small detection candidates ride DCN."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()             # global, ordered by process
    n = len(devs)
    if dp is None:
        dp = max(1, jax.process_count())
    assert n % dp == 0, (n, dp)
    return Mesh(np.array(devs).reshape(dp, n // dp), ("dp", "sp"))


def from_process_local(x_local: np.ndarray, mesh, spec):
    """Assemble a global jax.Array from each process's local shard.

    x_local: this process's rows of the global (B, N) batch — the
    host-local radio/ring feed.  The global batch is the concatenation
    over processes along the first sharded axis."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, x_local)


def surviving_mesh(exclude_processes=(), exclude_devices=(),
                   dp: int | None = None):
    """Host-failure recovery: rebuild the (dp, sp) mesh from surviving
    devices — the framework's defined failure behavior (SURVEY §5: the
    reference has no elastic story; ours is drop-and-rebalance).

    A dead host's channels are dropped, the remaining streams reshard
    over the new mesh, and decode resumes at the live edge of each
    surviving ring (per-window state only — the same Seek(END_POS)
    semantics as the node's backlog watchdog, so nothing needs
    restoring).  ``exclude_processes``: process indices of failed hosts;
    ``exclude_devices``: individual failed devices.
    """
    import jax
    from jax.sharding import Mesh

    dead_p = set(exclude_processes)
    dead_d = set(exclude_devices)
    devs = [d for d in jax.devices()
            if d.process_index not in dead_p and d not in dead_d]
    if not devs:
        raise RuntimeError("no surviving devices")
    n = len(devs)
    if dp is None:
        dp = max(1, len({d.process_index for d in devs}))
    while n % dp:
        dp -= 1
    sp = n // dp
    return Mesh(np.array(devs[: dp * sp]).reshape(dp, sp), ("dp", "sp"))
