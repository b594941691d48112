"""Worker process for the 2-process localhost multi-host test.

    python tests/multihost_worker.py <port> <num_processes> <process_id> \
        <expected.npy>

Initializes multi-process JAX over localhost (CPU backend, 4 virtual
devices per process), builds the process-aligned ('pulse', 'ray') global
mesh, runs the sharded receive + pulse-axis DSP, and checks this process's
addressable pulse rows against the single-process expectation computed by
the parent.  Prints MULTIHOST_OK on success.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    port, n_proc, pid, expected_path = sys.argv[1:5]
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from beifong_tpu.parallel import distributed as dist
    from beifong_tpu.parallel.shard import receive_sharded
    import __graft_entry__ as g

    dist.initialize(f"localhost:{port}", int(n_proc), int(pid),
                    local_device_ids=list(range(4)))
    assert jax.process_count() == int(n_proc), jax.process_count()
    assert jax.device_count() == 4 * int(n_proc)
    assert jax.local_device_count() == 4

    mesh = dist.global_mesh()
    assert mesh.devices.shape == (int(n_proc), 4)
    # pulse axis rows must align with processes (DCN axis)
    for r in range(mesh.devices.shape[0]):
        procs = {d.process_index for d in mesh.devices[r]}
        assert procs == {r}, procs

    s, rx = g._build_scene(ground=False)
    sd = s.compile()
    shape_idx = s.shape_index_of_endpoint('receiver', rx.id)

    n_pulses, lanes = int(n_proc), 512
    pulse_starts = np.zeros(n_pulses, np.float32)
    sd_g = dist.make_global(sd, mesh)
    starts_g = dist.make_global(pulse_starts, mesh, P('pulse'))
    key_g = dist.make_global(
        np.asarray(jax.random.key_data(jax.random.key(11))), mesh)

    adcs = receive_sharded(sd_g, rx, shape_idx, None, mesh,
                           jax.random.wrap_key_data(key_g),
                           starts_g, lanes_per_device=lanes, max_depth=2)
    expected = np.load(expected_path)

    ok = True
    for shard in adcs.addressable_shards:
        row = shard.index[0]
        got = np.asarray(shard.data)
        want = expected[row]
        if not np.allclose(got, want, rtol=1e-5, atol=1e-7):
            ok = False
            print(f"proc {pid} pulse row {row}: max err "
                  f"{np.abs(got - want).max()}", flush=True)
    assert ok
    print(f"MULTIHOST_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
