"""Multi-host (DCN) structural validation: 2 localhost CPU processes.

The reference has no distributed story at all (SURVEY.md §2.5); BASELINE.md
asks for host->pod scaling.  Real multi-host TPU hardware is not available
in CI, so this proves the DCN axis *runs*: two OS processes bootstrap
`jax.distributed`, build the process-aligned ('pulse', 'ray') global mesh
(`parallel/distributed.py`), execute the sharded receive over it, and the
result must equal the single-process 8-device run of the same logical mesh
(the RNG folds on logical mesh indices, so the process layout must not
change the answer).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_HERE = os.path.dirname(__file__)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_localhost_dcn(tmp_path):
    import jax
    import __graft_entry__ as g
    from beifong_tpu.parallel.shard import make_mesh, receive_sharded

    # single-process expectation on the same logical (2, 4) mesh
    s, rx = g._build_scene(ground=False)
    sd = s.compile()
    shape_idx = s.shape_index_of_endpoint('receiver', rx.id)
    mesh = make_mesh(pulse=2, ray=4)
    expected = np.asarray(receive_sharded(
        sd, rx, shape_idx, None, mesh, jax.random.key(11),
        np.zeros(2, np.float32), lanes_per_device=512, max_depth=2))
    exp_path = str(tmp_path / "expected.npy")
    np.save(exp_path, expected)

    port = _free_port()
    # strip platform overrides AND the axon-TPU bootstrap gate: the ambient
    # sitecustomize pre-initializes the XLA backend when
    # PALLAS_AXON_POOL_IPS is set, which forbids jax.distributed.initialize
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS")
           and not k.startswith("PALLAS_AXON")}
    worker = os.path.join(_HERE, "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), "2", str(pid), exp_path],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {pid}" in out, out[-3000:]
