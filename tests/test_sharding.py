"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates the property the reference cannot test (it has no distributed
mode): sharded execution must be numerically equivalent to single-device.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from beifong_tpu.parallel.shard import (make_mesh, overlap_save_sharded,
                                        pulse_train_pipeline, receive_sharded)
from beifong_tpu.dsp import pulse as pulse_mod
from beifong_tpu.dsp.fir import lfm_chirp


@pytest.fixture(scope='module')
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(pulse=2, ray=4)


def test_overlap_save_halo_parity(mesh8):
    """Sharded overlap-save (ppermute halo) == single-device result."""
    rng = np.random.default_rng(0)
    n = 4096  # 4 shards x 1024 on the 'ray' axis
    m = 65
    n_fft = 256
    x = jnp.asarray(rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n)),
                    jnp.complex64)
    h = jnp.asarray(rng.normal(size=m), jnp.float32).astype(jnp.complex64)
    hf = jnp.fft.fft(h, n_fft)

    y_ref = pulse_mod.overlap_save(x, hf, n_fft, m)

    f = shard_map(
        lambda xl: overlap_save_sharded(xl, hf, n_fft, m, 'ray'),
        mesh=mesh8, in_specs=P('pulse', 'ray'), out_specs=P('pulse', 'ray'),
        check_vma=False)
    y_sh = f(x)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)


def test_pulse_train_pipeline_parity(mesh8):
    """Sharded pulse-compression + Doppler == dense jnp reference."""
    rng = np.random.default_rng(1)
    n_pulses, n_samples = 4, 2048
    rep = lfm_chirp(128, 1e6, -50e3, 100e3, 100e-6)
    cube = jnp.asarray(rng.normal(size=(n_pulses, n_samples))
                       + 1j * rng.normal(size=(n_pulses, n_samples)),
                       jnp.complex64)
    rd_sh = pulse_train_pipeline(mesh8, cube, rep)

    # dense reference: same causal matched filter + doppler fft
    n_taps = rep.shape[0]
    n_fft = 512
    h = jnp.fft.fft(jnp.conj(rep[::-1]), n_fft)
    rc = pulse_mod.overlap_save(cube, h, n_fft, n_taps)
    rd_ref = jnp.fft.fftshift(jnp.fft.fft(rc, axis=0), axes=0)
    np.testing.assert_allclose(np.abs(np.asarray(rd_sh)),
                               np.abs(np.asarray(rd_ref)), rtol=2e-4, atol=1e-3)


@pytest.mark.slow
def test_receive_sharded_runs_and_merges(mesh8):
    """Sharded receive: per-pulse ADCs come back populated, deterministic,
    and the 4-way ray psum merges more events than a single shard."""
    import __graft_entry__ as g
    s, rx = g._build_scene(ground=False)   # wigner rx: hemisphere toward -y
    scene_data = s.compile()
    shape_idx = s.shape_index_of_endpoint('receiver', rx.id)
    lanes = 1024
    pulse_starts = jnp.arange(4, dtype=jnp.float32) * 0.1
    run = lambda: np.asarray(receive_sharded(
        scene_data, rx, shape_idx, None, mesh8, jax.random.key(0),
        pulse_starts, lanes_per_device=lanes, max_depth=2))
    adcs = run()
    assert adcs.shape == (4, 64, 1, 3)
    counts = adcs[..., 2].sum(axis=(1, 2))
    assert (counts > 0).all()
    # deterministic under re-execution
    np.testing.assert_array_equal(adcs, run())
    # single-ray-shard mesh produces ~1/4 the events of the 4-way psum
    mesh1 = make_mesh(pulse=1, ray=1, devices=jax.devices()[:1])
    adcs1 = np.asarray(receive_sharded(
        scene_data, rx, shape_idx, None, mesh1, jax.random.key(0),
        pulse_starts[:1], lanes_per_device=lanes, max_depth=2))
    assert counts[0] > 2.0 * adcs1[..., 2].sum()


@pytest.mark.slow
def test_receive_sharded_matches_unsharded_stats(mesh8):
    """The sharded trace reproduces the single-device range profile: same
    peak bin (target round-trip) and comparable in-window energy."""
    import __graft_entry__ as g
    from beifong_tpu.receive import receive
    s, rx = g._build_scene(ground=False, rx_kind="omni")
    scene_data = s.compile()
    shape_idx = s.shape_index_of_endpoint('receiver', rx.id)
    lanes = 16384
    pulse_starts = jnp.zeros((2,), jnp.float32)
    # The estimator is heavy-tailed (WDF sinc tails x solid-angle weights),
    # so average a few independent seeds on each side.
    sig_sh = 0.0
    sig_u = 0.0
    n_seeds = 3
    for seed in range(n_seeds):
        adcs = receive_sharded(scene_data, rx, shape_idx, None, mesh8,
                               jax.random.key(seed), pulse_starts,
                               lanes_per_device=lanes, max_depth=2)
        sig_sh = sig_sh + np.asarray(adcs)[0, :, 0, 0] / (lanes * 4)
        adc_u, n_u = receive(s, scene_data, rx, seed=100 + seed,
                             spp=4 * lanes, max_depth=2)
        sig_u = sig_u + np.asarray(adc_u)[:, 0, 0] / n_u
    assert abs(int(sig_sh.argmax()) - int(sig_u.argmax())) <= 1
    # energy in the target window (peak +- 3 bins) agrees statistically
    pk = int(sig_u.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert sig_sh[lo:hi].sum() == pytest.approx(sig_u[lo:hi].sum(), rel=0.5)


def test_dryrun_multichip_wall_time():
    """The driver's 8-device dry run must complete well inside its budget
    (<5 min wall on a 4-core CPU host — VERDICT r3 #1; measured ~25 s).
    Run it exactly as the driver does: a fresh subprocess with 8 virtual
    CPU devices, killed hard at the budget so a compile-bomb regression
    fails fast instead of hanging the suite."""
    import os
    import subprocess
    import sys

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS")
           and not k.startswith("PALLAS_AXON")}
    code = (
        "import os;"
        "os.environ['JAX_PLATFORMS']='cpu';"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8';"
        "import jax;jax.config.update('jax_platforms','cpu');"
        f"import sys;sys.path.insert(0,{here!r});"
        "import __graft_entry__ as g;"
        "g.dryrun_multichip(8)")
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=300)
    except subprocess.TimeoutExpired:
        pytest.fail("dryrun_multichip(8) exceeded the 300 s budget "
                    "(compile-bomb regression — see VERDICT r3 weak #1)")
    assert out.returncode == 0, out.stderr[-3000:]
    assert "dryrun_multichip OK" in out.stdout
