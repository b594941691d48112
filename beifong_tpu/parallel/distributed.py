"""Multi-host (DCN) execution scaffolding.

The reference is strictly single-node (SURVEY.md §2.5: TBB threads, no
comm backend anywhere in `src/`).  The pod-scale design here:

  * the 'pulse' (slow-time) mesh axis spans PROCESSES — hosts — so its
    collectives (`all_gather` for the Doppler FFT, `psum` of per-pulse
    partials) ride DCN;
  * the 'ray' axis spans each host's local chips, so the hot ADC-merge
    `psum` and overlap-save `ppermute` halos ride ICI.

`parallel/shard.py` is written against a `Mesh` and works unchanged on the
global multi-process mesh built here; this module only adds process
bootstrap (`initialize`), the process-aligned mesh builder
(`global_mesh`), and replicated-input plumbing (`replicate`).

Launch recipe (v5p pod slice, one process per host):

    # on every host, same binary:
    python my_run.py --coordinator=<host0-ip>:8476 \
                     --num-processes=<n-hosts> --process-id=<i>

    # my_run.py:
    from beifong_tpu.parallel import distributed as dist
    dist.initialize(coordinator, num_processes, process_id)
    mesh = dist.global_mesh()          # ('pulse' = hosts, 'ray' = chips)
    sig, n = receive_sharded_pallas(scene, sd, rx, mesh, spp_per_device)

On TPU pods `initialize()` with no arguments autodetects everything from
the TPU environment metadata.

Validated structurally by `tests/test_multihost.py`: 2 CPU processes x 4
virtual devices on localhost run the full sharded receive + DSP chain and
agree with the single-process result.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Bootstrap multi-process JAX (wraps `jax.distributed.initialize`).

    On TPU pods call with no arguments (autodetected from the runtime
    environment); for CPU/localhost testing pass all three explicitly.
    Safe to call once per process, before any other JAX API touches
    devices."""
    kw = {}
    if coordinator_address is not None:
        kw['coordinator_address'] = coordinator_address
    if num_processes is not None:
        kw['num_processes'] = num_processes
    if process_id is not None:
        kw['process_id'] = process_id
    if local_device_ids is not None:
        kw['local_device_ids'] = local_device_ids
    jax.distributed.initialize(**kw)


def global_mesh(pulse_per_host: int = 1) -> Mesh:
    """('pulse', 'ray') mesh over ALL processes' devices, with the 'pulse'
    axis aligned to process boundaries so pulse-axis collectives cross DCN
    and ray-axis collectives stay on each host's ICI.

    pulse_per_host > 1 additionally splits each host's chips into that
    many pulse rows (for hosts with many chips and short ray axes)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = max(d.process_index for d in devs) + 1
    per_proc = len(devs) // n_proc
    assert per_proc % pulse_per_host == 0, \
        f"{per_proc} local devices not divisible by {pulse_per_host}"
    grid = np.asarray(devs).reshape(n_proc * pulse_per_host,
                                    per_proc // pulse_per_host)
    return Mesh(grid, ('pulse', 'ray'))


def replicate(x, mesh: Mesh):
    """Place a host-local (numpy/jnp) value as a fully-replicated global
    array on `mesh` — every process must pass the same value (the packed
    scene tables are deterministic, so they are)."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def make_global(tree, mesh: Mesh, spec: P = P()):
    """Lift a pytree of host-local arrays to GLOBAL arrays on `mesh` with
    partition `spec` (default: fully replicated).  Every process passes the
    same full-size value; each only materializes its addressable shards.
    This is the multi-process input plumbing for `parallel/shard.py` —
    single-process meshes work too (then it is just a device_put)."""
    def one(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec if x.ndim else P())
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])
    return jax.tree_util.tree_map(one, tree)


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0
