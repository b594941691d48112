"""Megakernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest
import jax

import __graft_entry__ as g
from beifong_tpu.receive import receive, develop_signal
from beifong_tpu.integrators.pallas_receive import (receive_pallas, supported,
                                                    TILE)


@pytest.mark.parametrize("kind", ["omni", "wigner"])
@pytest.mark.slow
def test_megakernel_matches_jnp(kind):
    s, rx = g._build_scene(ground=False, rx_kind=kind)
    sd = s.compile()
    assert supported(sd, rx)
    tp = 0.0
    tj = 0.0
    seeds = 3
    for seed in range(seeds):
        out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=seed,
                                max_depth=2, time_sampling='gate',
                                interpret=True)
        tp = tp + np.asarray(out)[:, 0] / n * rx.adc.n_time / seeds
        a, n2 = receive(s, sd, rx, seed=100 + seed, spp=1 << 14, max_depth=2,
                        time_sampling='gate')
        tj = tj + np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0] / seeds
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    # signed aperture weights make totals heavy-tailed; compare energy in
    # the peak window with a loose statistical bound
    pk = int(tj.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)


@pytest.mark.slow
def test_megakernel_large_1d_adc_mxu_splat():
    """Fast-time-only grids past the 512-cell unroll cap ride the MXU
    dot_general splat (freq factor == 1): a 1024-bin run coarsened 16x
    must reproduce the 64-bin unrolled run bin-for-bin (identical draws,
    only the splat path differs — tent width is the one divergence)."""
    import dataclasses as dc
    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd = s.compile()
    rx_big = dc.replace(rx, adc=dc.replace(rx.adc, n_time=1024))
    assert supported(sd, rx_big)
    out_b, nb = receive_pallas(s, sd, rx_big, spp=1 << 13, seed=11,
                               max_depth=2, time_sampling='gate',
                               interpret=True)
    out_s, ns = receive_pallas(s, sd, rx, spp=1 << 13, seed=11,
                               max_depth=2, time_sampling='gate',
                               interpret=True)
    assert nb == ns
    coarse = np.asarray(out_b)[:, 0].reshape(64, 16).sum(axis=1)
    fine = np.asarray(out_s)[:, 0]
    assert coarse.sum() == pytest.approx(fine.sum(), rel=1e-3)
    pk = int(fine.argmax())
    assert abs(int(coarse.argmax()) - pk) <= 1
    lo, hi = max(pk - 2, 0), pk + 3
    assert coarse[lo:hi].sum() == pytest.approx(fine[lo:hi].sum(), rel=0.05)


@pytest.mark.slow
def test_megakernel_deterministic_and_scales():
    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd = s.compile()
    out1, n1 = receive_pallas(s, sd, rx, spp=TILE * 4, seed=7, max_depth=2,
                              time_sampling='gate', interpret=True)
    out1b, _ = receive_pallas(s, sd, rx, spp=TILE * 4, seed=7, max_depth=2,
                              time_sampling='gate', interpret=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out1b))
    # more samples -> proportionally more accumulated signal
    out2, n2 = receive_pallas(s, sd, rx, spp=TILE * 8, seed=7, max_depth=2,
                              time_sampling='gate', interpret=True)
    r = np.asarray(out2).sum() / max(np.asarray(out1).sum(), 1e-30)
    assert r == pytest.approx(2.0, rel=0.5)


def test_supported_gates():
    from beifong_tpu.radar import linfmcw, wigner_transmitter
    s, rx = g._build_scene(ground=False)
    sd = s.compile()
    assert supported(sd, rx)
    # mesh scenes ARE in scope now (in-kernel BVH) — but only with one
    # shared mesh reflectance; mixed-material meshes fall back
    import beifong_tpu as bt
    from beifong_tpu import scene as sc
    from beifong_tpu.geometry.mesh import MeshSpec, make_grid
    from beifong_tpu.bsdf import diffuse
    s2 = sc.Scene(band=bt.band_preset("ultrasound_40k"))
    s2.add(diffuse("d"))
    v, f = make_grid(2, 2)
    s2.add(MeshSpec(v, f, bsdf="d"))
    s2.add(wigner_transmitter("tx", linfmcw(40e3, 10.0, 0.05, 2e3),
                              resample_freq=True))
    from beifong_tpu.geometry import shapes as sh
    s2.add(sh.rectangle(transmitter="tx"))
    assert supported(s2.compile(), rx)
    # differing per-shape reflectance is IN scope (per-tri leaf payload)…
    s2.add(diffuse("d2", reflectance=0.9))
    v2, f2 = make_grid(2, 2)
    s2.add(MeshSpec(v2, f2, bsdf="d2"))
    assert supported(s2.compile(), rx)
    # …and so are differing mesh BSDF *types* and DIFFERING velocities
    # (per-shape SMEM table resolved by the tri's shape-row payload)
    from beifong_tpu.bsdf import rough_conductor
    s2.add(rough_conductor("rc", alpha=0.3))
    v3, f3 = make_grid(2, 2)
    s2.add(MeshSpec(v3, f3, bsdf="rc"))
    assert supported(s2.compile(), rx)
    # moving ANALYTIC shapes are in scope (in-kernel Doppler chain)…
    s3, rx3 = g._build_scene(ground=False)
    s3.shapes[-1].velocity = np.asarray([1.0, 0.0, 0.0], np.float32)
    assert supported(s3.compile(), rx3)
    # …and rigidly-moving meshes, including DIFFERING per-body velocities
    s3b, rx3b = _mesh_scene()
    mesh_specs = [sp_ for sp_ in s3b.shapes
                  if hasattr(sp_, 'faces') and sp_.faces is not None]
    for sp_ in mesh_specs:
        sp_.velocity = np.asarray([1.0, 0.0, 0.0], np.float32)
    assert supported(s3b.compile(use_bvh=False), rx3b)
    v2_, f2_ = mesh_specs[0].vertices, mesh_specs[0].faces
    from beifong_tpu.geometry.mesh import MeshSpec as _MS
    extra = _MS(v2_, f2_, bsdf="mat")
    extra.velocity = np.asarray([0.0, 2.0, 0.0], np.float32)
    s3b.add(extra)
    assert supported(s3b.compile(use_bvh=False), rx3b)
    # identical bodies collapse to one table row (no cap pressure)…
    s3c, rx3c = _mesh_scene()
    for k_ in range(65):
        ms = _MS(v2_, f2_, bsdf="mat")
        s3c.add(ms)
    assert supported(s3c.compile(use_bvh=False), rx3c)
    # …but >64 DISTINCT (velocity, lobe) rows fall back with a reason
    s3d, rx3d = _mesh_scene()
    for k_ in range(65):
        ms = _MS(v2_, f2_, bsdf="mat")
        ms.velocity = np.asarray([0.1 * (k_ + 1), 0.0, 0.0], np.float32)
        s3d.add(ms)
    why3 = []
    assert not supported(s3d.compile(use_bvh=False), rx3d, why3)
    assert any('mesh-shape rows' in w for w in why3)
    # oversized ADC grids must be rejected with a reason; all grids past
    # the small unrolled 1-D case go through the MXU dot_general splat
    # (caps: 131072 cells / 8192 fast-time rows / 8192 freq rows)
    import dataclasses as dc
    big = dc.replace(rx, adc=dc.replace(rx.adc, n_time=1024, n_freq=1))
    assert supported(sd, big)     # 1-D past 512 now rides the MXU splat
    # factorized 1-D splat reaches the reference's 62.5k samples/chirp...
    big1b = dc.replace(rx, adc=dc.replace(rx.adc, n_time=65536, n_freq=1))
    assert supported(sd, big1b)
    # ...but not past it, and the extent must tile the 128-lane axis
    big1c = dc.replace(rx, adc=dc.replace(rx.adc, n_time=131072, n_freq=1))
    why = []
    assert not supported(sd, big1c, why)
    assert any('1-D ADC extent' in w for w in why)
    odd1d = dc.replace(rx, adc=dc.replace(rx.adc, n_time=600, n_freq=1))
    why = []
    assert not supported(sd, odd1d, why)
    assert any('multiple of 128' in w for w in why)
    # at the cap: 512x256 = 131072 cells verified on v5e hardware
    atcap = dc.replace(rx, adc=dc.replace(rx.adc, n_time=512, n_freq=256))
    assert supported(sd, atcap)
    # just over the cap: 1024x256 = 262144 cells
    big2 = dc.replace(rx, adc=dc.replace(rx.adc, n_time=1024, n_freq=256))
    why = []
    assert not supported(sd, big2, why)
    assert any('cells' in w for w in why)
    # a thin grid inside the cell cap but with an oversized FREQ extent
    # must be rejected too (its (n_freq, LANE) tent tile blows VMEM)
    bigf = dc.replace(rx, adc=dc.replace(rx.adc, n_time=2, n_freq=16384))
    why = []
    assert not supported(sd, bigf, why)
    assert any('freq extent' in w for w in why)
    ok2 = dc.replace(rx, adc=dc.replace(rx.adc, n_time=64, n_freq=128))
    assert supported(sd, ok2)
    ok3 = dc.replace(rx, adc=dc.replace(rx.adc, n_time=8192, n_freq=1))
    assert supported(sd, ok3)


def test_receive_use_pallas_auto():
    """use_pallas='auto' routes supported scenes through the megakernel
    (forced into interpret mode here — no real TPU in CI)."""
    from beifong_tpu.integrators import pallas_receive as pr
    import unittest.mock as mock
    s, rx = g._build_scene(ground=False)
    sd = s.compile()
    orig = pr.receive_pallas

    def fake(*a, **k):
        k['interpret'] = True
        return orig(*a, **k)

    with mock.patch.object(pr, 'receive_pallas', fake):
        adc, n = receive(s, sd, rx, spp=TILE, max_depth=2,
                         time_sampling='gate', use_pallas='auto')
    assert adc.shape == (64, 1, 3)
    assert n == TILE


def test_receive_defaults_to_kernel_on_tpu():
    """The library DEFAULT (use_pallas unset) must route a supported scene
    through the megakernel when the backend is TPU (VERDICT r2 weak #4)."""
    import jax as _jax
    from beifong_tpu.integrators import pallas_receive as pr
    import unittest.mock as mock
    s, rx = g._build_scene(ground=False)
    sd = s.compile()
    called = []

    def fake(*a, **k):
        called.append(True)
        import jax.numpy as jnp
        return jnp.ones((rx.adc.n_time, rx.adc.n_freq)), TILE

    with mock.patch.object(pr, 'receive_pallas', fake), \
            mock.patch.object(_jax, 'default_backend', lambda: 'tpu'):
        adc, n = receive(s, sd, rx, spp=TILE, max_depth=2,
                         time_sampling='gate')   # no use_pallas arg
    assert called, "default receive() did not route through the megakernel"
    assert n == TILE and float(np.asarray(adc)[..., 0].sum()) > 0


def test_receive_auto_survives_kernel_failure():
    """'auto' must never crash a run the jnp wavefront can finish: an
    unexpected Mosaic/XLA rejection logs and falls back; an explicit
    use_pallas=True re-raises."""
    import jax as _jax
    from beifong_tpu.integrators import pallas_receive as pr
    import unittest.mock as mock
    s, rx = g._build_scene(ground=False)
    sd = s.compile()

    def boom(*a, **k):
        raise RuntimeError("Mosaic says no")

    with mock.patch.object(pr, 'receive_pallas', boom), \
            mock.patch.object(_jax, 'default_backend', lambda: 'tpu'):
        adc, n = receive(s, sd, rx, spp=1 << 12, max_depth=2,
                         time_sampling='gate', use_pallas='auto', seed=7)
        assert np.asarray(adc)[..., 0].sum() > 0   # jnp result came back
        with pytest.raises(RuntimeError, match="Mosaic"):
            receive(s, sd, rx, spp=1 << 12, max_depth=2,
                    time_sampling='gate', use_pallas=True, seed=7)


def test_megakernel_coherent_phase_physics():
    """Coherent I/Q in the megakernel: quarter-wavelength target shift flips
    the echo phase by ~pi (same physics test as the jnp coherent path)."""
    import numpy as np
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import cw, wigner_transmitter, omni_receiver, ADCConfig
    C, fc = 340.0, 40e3
    lam = C / fc

    def build(R):
        band = Band.from_freq(C, fc, 10e3)
        s = sc.Scene(band=band)
        s.add(diffuse("mat", reflectance=1.0, twosided=True))
        s.add(wigner_transmitter("tx", cw(f_centre=fc), resample_freq=True))
        aim = np.asarray(tf.compose(tf.look_at([0.0, 0, 0], [0.0, -1, 0]),
                                    tf.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        adcc = ADCConfig(n_time=4, n_freq=1, sampling_start=0.0,
                         sampling_time=0.05, freq_lo=35e3, freq_hi=45e3)
        rx = omni_receiver("rx", adcc, position=(0.0, 0.0, 0.0),
                           receive_type='raw')
        s.add(rx)
        tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                    tf.scale(0.3)))
        s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
        return s, rx

    phases = []
    for R in (4.0, 4.0 + lam / 4):
        s, rx = build(R)
        sd = s.compile()
        out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=3, max_depth=2,
                                time_sampling='gate', interpret=True,
                                coherent=True)
        a = np.asarray(out)
        iq = complex(a[..., 0].sum(), a[..., 1].sum())
        assert abs(iq) > 0
        phases.append(np.angle(iq))
    dphi = (phases[1] - phases[0]) % (2 * np.pi)
    assert dphi == pytest.approx(np.pi, abs=0.5), f"dphi={dphi}"


def test_sharded_megakernel_psum_merge():
    """Megakernel under shard_map: per-device kernels + full-mesh psum give
    the merged profile (2-device CPU mesh, interpret mode)."""
    from beifong_tpu.parallel.shard import make_mesh, receive_sharded_pallas
    s, rx = g._build_scene(ground=False)
    sd = s.compile()
    mesh = make_mesh(pulse=1, ray=2, devices=jax.devices()[:2])
    sig, n = receive_sharded_pallas(s, sd, rx, mesh, spp_per_device=8192,
                                    seed=0, max_depth=1, interpret=True)
    a = np.asarray(sig)[:, 0] / n * 64
    assert n == 16384
    assert int(a.argmax()) in (25, 26, 27)
    assert a.sum() > 0


def _mesh_scene(R=4.0, n_side=9):
    """Point-target scene with a crumpled-grid mesh target."""
    import beifong_tpu as bt
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.geometry.mesh import MeshSpec, make_grid
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    band = Band.from_freq(340.0, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    from beifong_tpu.core import transform as tfm
    aim = np.asarray(tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                 tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tfm.compose(tfm.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                    tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    v, f = make_grid(n_side, n_side)
    v = np.asarray(v, np.float32)
    v[:, 2] = 0.05 * np.sin(4 * v[:, 0]) * np.cos(3 * v[:, 1])
    m = np.asarray(tfm.compose(tfm.look_at([0, -R, 0], [0, 0, 0]),
                               tfm.scale(0.6)))
    s.add(MeshSpec(v, np.asarray(f), bsdf="mat", to_world=m))
    return s, rx


@pytest.mark.slow
def test_megakernel_mesh_matches_jnp():
    """Mesh scenes in the megakernel (in-kernel speculative BVH walk,
    geometry/pallas_bvh.py): round-trip peak bin must match the jnp
    wavefront's on the same scene.  (Analogue of the reference's OptiX
    wavefront covering mesh shapes, scene_optix.inl.)"""
    from beifong_tpu.receive import develop_signal
    s, rx = _mesh_scene()
    sd = s.compile(use_bvh=False)
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 12, seed=0, max_depth=1,
                            time_sampling='gate', interpret=True)
    tp = np.asarray(out)[:, 0] / n * rx.adc.n_time
    a, n2 = receive(s, sd, rx, seed=11, spp=1 << 13, max_depth=1,
                    time_sampling='gate')
    tj = np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0]
    assert tp.sum() > 0
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1


def _two_tx_scene(R=4.0):
    """Two pulse transmitters at different ranges from the target: the
    received profile has two returns (direct NEE per tx in the kernel)."""
    import beifong_tpu as bt
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    band = Band.from_freq(340.0, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx1", wf, resample_freq=True))
    s.add(wigner_transmitter("tx2", wf, resample_freq=True))
    aim1 = np.asarray(tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                  tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim1, transmitter="tx1"))
    # tx2 sits 2 m behind tx1: its echo arrives ~2/c later
    aim2 = np.asarray(tfm.compose(tfm.look_at([0.6, 2.0, 0], [0.6, -1, 0]),
                                  tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim2, transmitter="tx2"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tfm.compose(tfm.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                    tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tfm.compose(tfm.look_at([0, -R, 0], [0, 0, 0]),
                                 tfm.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
    return s, rx


@pytest.mark.slow
def test_megakernel_multi_transmitter():
    """Per-tx NEE in the kernel: a 2-tx scene is in scope and its range
    profile matches the jnp wavefront (which MC-samples one tx per lane)."""
    from beifong_tpu.receive import develop_signal
    s, rx = _two_tx_scene()
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 13, seed=0, max_depth=2,
                            time_sampling='gate', interpret=True)
    tp = np.asarray(out)[:, 0] / n * rx.adc.n_time
    a, n2 = receive(s, sd, rx, seed=5, spp=1 << 13, max_depth=2,
                    time_sampling='gate')
    tj = np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0]
    assert tp.sum() > 0
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    pk = int(tj.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)
    # the farther tx contributes a later, resolvable return in BOTH paths
    t_axis = (np.arange(64) + 0.5) / 64 * rx.adc.sampling_time
    far = t_axis > t_axis[pk] + 4e-3
    assert tp[far].sum() > 0.05 * tp.sum()
    assert tj[far].sum() > 0.05 * tj.sum()


@pytest.mark.slow
def test_megakernel_rough_conductor():
    """GGX rough-conductor target in the kernel: peak bin and peak-window
    energy match the jnp wavefront (bsdf/eval.py lobe)."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import rough_conductor
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import develop_signal
    R = 4.0
    band = Band.from_freq(340.0, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(rough_conductor("metal", alpha=0.5, eta=0.2, k=3.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                 tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tfm.compose(tfm.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                    tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tfm.compose(tfm.look_at([0, -R, 0], [0, 0, 0]),
                                 tfm.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="metal"))
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    # heavy-tailed estimator (signed WDF weights): average a few seeds on
    # each side before comparing energies
    tp = 0.0
    tj = 0.0
    seeds = 3
    for seed in range(seeds):
        out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=seed,
                                max_depth=2, time_sampling='gate',
                                interpret=True)
        tp = tp + np.asarray(out)[:, 0] / n * rx.adc.n_time / seeds
        a, n2 = receive(s, sd, rx, seed=7 + seed, spp=1 << 14, max_depth=2,
                        time_sampling='gate')
        tj = tj + np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0] / seeds
    assert tp.sum() > 0 and tj.sum() > 0
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    pk = int(tj.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)


@pytest.mark.slow
def test_megakernel_mesh_per_shape_reflectance():
    """Two mesh targets with different reflectances: the per-tri leaf
    payload scales each return — near/far peak ratio tracks refl ratio."""
    import beifong_tpu as bt
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.geometry.mesh import MeshSpec, make_grid
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import develop_signal

    from beifong_tpu.radar import omni_receiver

    def build(refl_near, refl_far):
        band = Band.from_freq(340.0, 40e3, 10e3)
        s = sc.Scene(band=band)
        s.add(diffuse("a", reflectance=refl_near, twosided=True))
        s.add(diffuse("b", reflectance=refl_far, twosided=True))
        wf = pulse(f_centre=40e3, prf=10.0, pulse_len=1.5e-3, f_ext=2e3,
                   is_delta=True)
        s.add(wigner_transmitter("tx", wf, resample_freq=True))
        # small aperture (lambda/2w ~ 49 deg) so BOTH offset targets sit in
        # the mainlobe; omni rx keeps the estimator weights positive
        aim = np.asarray(tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                     tfm.scale([0.005, 0.005, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                        sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
        rx = omni_receiver("rx", adc, position=(0.0, 0.0, 0.0),
                           receive_type='raw')
        s.add(rx)
        v, f = make_grid(5, 5)
        # near target offset left, far target offset right: both visible
        m1 = np.asarray(tfm.compose(tfm.look_at([-0.6, -3.0, 0], [-0.6, 0, 0]),
                                    tfm.scale(0.5)))
        s.add(MeshSpec(np.asarray(v, np.float32), np.asarray(f), bsdf="a",
                       to_world=m1))
        m2 = np.asarray(tfm.compose(tfm.look_at([0.6, -6.0, 0], [0.6, 0, 0]),
                                    tfm.scale(0.5)))
        s.add(MeshSpec(np.asarray(v, np.float32), np.asarray(f), bsdf="b",
                       to_world=m2))
        return s, rx

    t_axis = (np.arange(64) + 0.5) / 64 * 0.06

    def profile(refl_near, refl_far, seed):
        s, rx = build(refl_near, refl_far)
        sd = s.compile(use_bvh=False)
        why = []
        assert supported(sd, rx, why), why
        out, n = receive_pallas(s, sd, rx, spp=1 << 13, seed=seed,
                                max_depth=1, time_sampling='gate',
                                interpret=True)
        return np.asarray(out)[:, 0] / n * 64

    p_eq = profile(0.8, 0.8, 0)
    p_dim = profile(0.8, 0.2, 0)
    near_w = (t_axis > 0.015) & (t_axis < 0.025)   # ~2*3.06/340 + pulse
    far_w = (t_axis > 0.031) & (t_axis < 0.043)    # ~2*6.05/340 + pulse
    assert p_eq[near_w].sum() > 0 and p_eq[far_w].sum() > 0
    # near return unchanged, far return scaled by 0.2/0.8
    assert p_dim[near_w].sum() == pytest.approx(p_eq[near_w].sum(), rel=0.05)
    ratio = p_dim[far_w].sum() / p_eq[far_w].sum()
    assert ratio == pytest.approx(0.25, rel=0.2), ratio


@pytest.mark.slow
def test_megakernel_doppler_shift():
    """In-kernel first-order Doppler: a radially closing CW target shifts
    the received frequency bin by ~2v/c * fc, matching both the analytic
    value and the jnp wavefront (radar_path.py Doppler chain)."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import cw, wigner_transmitter, omni_receiver, ADCConfig
    from beifong_tpu.receive import develop_signal
    C, fc, v = 340.0, 40e3, 5.0

    def build(vel):
        band = Band.from_freq(C, fc, 10e3)
        s = sc.Scene(band=band)
        s.add(diffuse("mat", reflectance=1.0, twosided=True))
        s.add(wigner_transmitter("tx", cw(f_centre=fc), resample_freq=True))
        aim = np.asarray(tfm.compose(tfm.look_at([0.0, 0, 0], [0.0, -1, 0]),
                                     tfm.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        adcc = ADCConfig(n_time=2, n_freq=64, sampling_start=0.0,
                         sampling_time=0.04, freq_lo=39e3, freq_hi=43e3)
        rx = omni_receiver("rx", adcc, position=(0.0, 0.0, 0.0),
                           receive_type='raw')
        s.add(rx)
        tgt = sh.rectangle(to_world=np.asarray(
            tfm.compose(tfm.look_at([0, -4.0, 0], [0, 0, 0]),
                        tfm.scale(0.3))), bsdf="mat")
        tgt.velocity = np.asarray(vel, np.float32)
        s.add(tgt)
        return s, rx

    def fpeaks(vel):
        s, rx = build(vel)
        sd = s.compile()
        assert supported(sd, rx)
        out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=2, max_depth=2,
                                time_sampling='gate', interpret=True)
        fp = np.asarray(out).sum(0)[:, None] if np.asarray(out).ndim == 2 \
            else np.asarray(out)
        fk = int(np.asarray(out).sum(axis=0).argmax())
        a, n2 = receive(s, sd, rx, seed=3, spp=1 << 14, max_depth=2,
                        time_sampling='gate')
        fj = int(np.asarray(develop_signal(a, n2, rx.adc))[:, :, 0]
                 .sum(axis=0).argmax())
        return fk, fj

    fk0, fj0 = fpeaks([0.0, 0.0, 0.0])
    fk1, fj1 = fpeaks([0.0, 3.0, 0.0])   # +y = toward the radar: closing
    bin_w = 4e3 / 64
    shift_bins = 2 * v / C * fc / bin_w * (3.0 / v)   # v=3 -> ~11.3 bins
    assert fk0 == fj0
    assert fk1 == fj1
    assert (fk1 - fk0) == pytest.approx(2 * 3.0 / C * fc / bin_w, abs=1.5)


@pytest.mark.slow
def test_megakernel_mesh_doppler_shift():
    """Rigid mesh velocity (scene-shared slot): a closing mesh target
    Doppler-shifts the received frequency like the jnp path."""
    from beifong_tpu.receive import develop_signal
    import dataclasses as dc

    def build(vy):
        s, rx = _mesh_scene()
        for sp_ in s.shapes:
            if hasattr(sp_, 'faces') and sp_.faces is not None:
                sp_.velocity = np.asarray([0.0, vy, 0.0], np.float32)
        rx = dc.replace(rx, adc=dc.replace(rx.adc, n_time=2, n_freq=64,
                                           sampling_time=0.04,
                                           freq_lo=39e3, freq_hi=43e3))
        # swap the receiver spec in the scene for the freq-binned ADC
        s.receivers[0] = rx
        return s, rx

    def fpeak(vy):
        s, rx = build(vy)
        sd = s.compile(use_bvh=False)
        assert supported(sd, rx)
        out, n = receive_pallas(s, sd, rx, spp=1 << 13, seed=1, max_depth=1,
                                time_sampling='gate', interpret=True)
        fk = int(np.asarray(out).sum(axis=0).argmax())
        a, n2 = receive(s, sd, rx, seed=4, spp=1 << 13, max_depth=1,
                        time_sampling='gate')
        fj = int(np.asarray(develop_signal(a, n2, rx.adc))[:, :, 0]
                 .sum(axis=0).argmax())
        return fk, fj

    fk0, fj0 = fpeak(0.0)
    fk1, fj1 = fpeak(3.0)
    assert abs(fk0 - fj0) <= 1 and abs(fk1 - fj1) <= 1
    bin_w = 4e3 / 64
    assert (fk1 - fk0) == pytest.approx(2 * 3.0 / 340.0 * 40e3 / bin_w,
                                        abs=1.5)


def _two_mesh_scene(R1=3.0, R2=5.5, bsdf2="mat", v2=0.0):
    """Two separate mesh bodies at different ranges; the second can carry
    its own material and rigid velocity (per-shape SMEM table)."""
    from beifong_tpu.geometry.mesh import MeshSpec, make_grid
    from beifong_tpu.core import transform as tfm
    s, rx = _mesh_scene(R=R1)
    # shrink the tx/rx apertures 4x: body 2 sits ~15 deg off boresight,
    # outside the default 0.1 m apertures' WDF mainlobe (lambda/w ~ 5 deg)
    for sp_ in s.shapes:
        ep = getattr(sp_, 'transmitter', None) or getattr(sp_, 'receiver',
                                                          None)
        if ep:
            m_old = np.asarray(sp_.to_world)
            sp_.to_world = m_old @ np.asarray(
                tfm.scale([0.25, 0.25, 1.0]))
    if bsdf2 != "mat":
        from beifong_tpu.bsdf import rough_conductor
        s.add(rough_conductor(bsdf2, specular_reflectance=1.0, alpha=0.3,
                              eta=1.5, k=3.0, twosided=True))
    v, f = make_grid(7, 7)
    v = np.asarray(v, np.float32)
    v[:, 2] = 0.04 * np.sin(3 * v[:, 0])
    # offset in z so body 1 (at the origin line of sight) doesn't occlude
    p2 = np.asarray([0.0, -R2, 1.5])
    m2 = np.asarray(tfm.compose(tfm.look_at(p2, [0, 0, 0]),
                                tfm.scale(0.6)))
    spec = MeshSpec(v, np.asarray(f), bsdf=bsdf2, to_world=m2)
    spec.velocity = np.asarray([0.0, v2, 0.0], np.float32)
    s.add(spec)
    # two-way delay of body 2 (tx at ~(0.3,0,0), rx at ~(-0.3,0,0))
    tau2 = (np.linalg.norm(p2 - [0.3, 0, 0])
            + np.linalg.norm(p2 - [-0.3, 0, 0])) / 340.0
    return s, rx, float(tau2), p2


@pytest.mark.slow
def test_megakernel_multi_body_mesh():
    """Two mesh bodies with DIFFERENT materials (diffuse + GGX conductor)
    stay in the kernel (per-shape lobe table): range profile shows both
    returns and matches the jnp wavefront."""
    from beifong_tpu.receive import develop_signal
    s, rx, tau2, _p2 = _two_mesh_scene(bsdf2="metal2")
    sd = s.compile(use_bvh=False)
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 13, seed=0, max_depth=1,
                            time_sampling='gate', interpret=True)
    tp = np.asarray(out)[:, 0] / n * rx.adc.n_time
    a, n2 = receive(s, sd, rx, seed=9, spp=1 << 13, max_depth=1,
                    time_sampling='gate')
    tj = np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0]
    assert tp.sum() > 0
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    # both bodies return: energy around each expected delay in BOTH paths
    c = 340.0
    for tau in (2 * 3.0 / c, tau2):
        b = int(round(tau / rx.adc.sampling_time * rx.adc.n_time - 0.5))
        assert tp[b - 3:b + 4].sum() > 0.005 * tp.sum(), (tau, tp)
        assert tj[b - 3:b + 4].sum() > 0.005 * tj.sum(), (tau, tj)


@pytest.mark.slow
def test_megakernel_multi_body_velocities():
    """Two mesh bodies with DIFFERENT rigid velocities: the static body's
    echo stays at the carrier while the closing body's is Doppler-shifted
    by 2v/c * f0 — resolved per time gate (per-shape velocity table; the
    old kernel collapsed all meshes to one shared velocity)."""
    import dataclasses as dc
    s, rx, tau2, p2 = _two_mesh_scene(v2=3.0)
    rx = dc.replace(rx, adc=dc.replace(rx.adc, n_time=16, n_freq=32,
                                       sampling_time=0.06,
                                       freq_lo=39e3, freq_hi=43e3))
    s.receivers[0] = rx
    sd = s.compile(use_bvh=False)
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=1, max_depth=1,
                            time_sampling='gate', interpret=True)
    grid = np.asarray(out)
    c, f0 = 340.0, 40e3
    bw = (43e3 - 39e3) / 32
    f0_bin = int((f0 - 39e3) / (43e3 - 39e3) * 32 - 0.5)
    tb1 = int(round(2 * 3.0 / c / 0.06 * 16 - 0.5))   # static body gate
    tb2 = int(round(tau2 / 0.06 * 16 - 0.5))          # moving body gate
    spec1 = grid[max(tb1 - 1, 0):tb1 + 2].sum(axis=0)
    spec2 = grid[max(tb2 - 1, 0):tb2 + 2].sum(axis=0)
    assert spec1.sum() > 0 and spec2.sum() > 0
    assert abs(int(spec1.argmax()) - f0_bin) <= 1
    # radial closing speed: v2 * (unit toward radar) . y_hat
    v_rad = 3.0 * (np.linalg.norm(p2[1]) / np.linalg.norm(p2))
    shift_bins = 2 * v_rad / c * f0 / bw
    assert int(spec2.argmax()) - int(spec1.argmax()) == pytest.approx(
        shift_bins, abs=1.5)


@pytest.mark.slow
def test_megakernel_rect_demotion():
    """>MAX_PRIMS analytic scenes stay in the kernel: plain rects are
    demoted into the triangle BVH (two exact world-space tris each, BSDF
    and velocity via the per-shape table) instead of falling back to the
    jnp wavefront.  Profile parity with the jnp path on a 70-rect clutter
    scene."""
    from beifong_tpu.receive import develop_signal
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.integrators.pallas_receive import MAX_PRIMS
    import test_radar as TR

    s, rx = TR._point_target_scene()
    rng = np.random.default_rng(3)
    for k in range(MAX_PRIMS + 6):
        # small clutter plates scattered around/behind the target
        x = float(rng.uniform(-2.5, 2.5))
        z = float(rng.uniform(-2.0, 2.0))
        y = float(rng.uniform(-9.0, -5.5))
        m = np.asarray(tfm.compose(tfm.look_at([x, y, z], [0, 0, 0]),
                                   tfm.scale(0.12)))
        s.add(sh.rectangle(to_world=m, bsdf="mat"))
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 13, seed=0, max_depth=1,
                            time_sampling='gate', interpret=True)
    tp = np.asarray(out)[:, 0] / n * rx.adc.n_time
    a, n2 = receive(s, sd, rx, seed=5, spp=1 << 13, max_depth=1,
                    time_sampling='gate')
    tj = np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0]
    assert tp.sum() > 0
    # main target peak identical; clutter band populated in both paths
    # (presence of contributions, not their signed sum — the MIS beam
    # lobe sends few lanes at off-boresight clutter, whose signed WDF
    # weights can sum arbitrarily close to zero at this spp)
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    far = np.arange(64) > int(tj.argmax()) + 4
    assert np.abs(tp[far]).sum() > 0 and np.abs(tj[far]).sum() > 0
    pk = int(tj.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)


@pytest.mark.slow
def test_megakernel_specular_flash():
    """Smooth-conductor plate facing the radar: the echo comes ONLY from
    the delta chain (mirror bounce -> direct tx hit at depth 1 — NEE has
    zero density on a mirror).  Peak at (path length)/c + pulse centre in
    both the kernel and the jnp wavefront (radar_path.py is_delta
    emission_weight)."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import conductor
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import develop_signal
    C, R, plen_ = 340.0, 4.0, 2e-3
    band = Band.from_freq(C, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(conductor("mirror", eta=0.2, k=3.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=plen_, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    # tx rect at the origin plane: mirror-returned rays land on it
    aim = np.asarray(tfm.compose(tfm.look_at([0.0, 0, 0], [0.0, -1, 0]),
                                 tfm.scale([0.5, 0.5, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    # rx aperture in front of the tx plane, looking at the plate: every
    # lane shoots toward the mirror, reflects back to the tx plane
    aim_rx = np.asarray(tfm.compose(tfm.look_at([0.0, -0.3, 0],
                                                [0.0, -4, 0]),
                                    tfm.scale([0.02, 0.02, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tfm.compose(tfm.look_at([0, -R, 0], [0, 0, 0]),
                                 tfm.scale(1.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mirror"))
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=0, max_depth=2,
                            time_sampling='gate', interpret=True)
    tp = np.asarray(out)[:, 0]
    assert tp.sum() != 0, "no specular flash in the kernel"
    t_axis = (np.arange(64) + 0.5) / 64 * 0.06
    # path: rx(0,-0.3) -> plate(-4) -> tx plane(0): 3.7 + 4 = 7.7 m
    t_expect = 7.7 / C + plen_ / 2
    bin_w = 0.06 / 64
    assert abs(t_axis[np.abs(tp).argmax()] - t_expect) < 2.5 * bin_w
    a, n2 = receive(s, sd, rx, seed=3, spp=1 << 14, max_depth=2,
                    time_sampling='gate')
    tj = np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0]
    assert tj.sum() != 0
    assert abs(int(np.abs(tp).argmax()) - int(np.abs(tj).argmax())) <= 1


@pytest.mark.slow
def test_megakernel_corner_reflector():
    """Trihedral corner reflector (three mutually-perpendicular conductor
    plates): three mirror bounces act as a point reflection through the
    apex, so the echo arrives at 2|radar - apex|/c regardless of where the
    beam enters — the classic radar calibration target, running entirely on
    the kernel's delta chain (mirror bounces -> direct tx hit at depth 3)."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import conductor
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    C, R, plen_ = 340.0, 4.0, 2e-3
    band = Band.from_freq(C, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(conductor("m", eta=0.2, k=3.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=plen_, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tfm.compose(tfm.look_at([0.0, 0, 0], [0.0, -1, 0]),
                                 tfm.scale([0.8, 0.8, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    apex = np.asarray([-0.5, -R, -0.5])
    aim_rx = np.asarray(tfm.compose(
        tfm.look_at([0.0, -0.1, 0.0], apex + [0.5, 0.5, 0.5]),
        tfm.scale([0.02, 0.02, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    # three faces of the corner octant at the apex
    f1 = tfm.compose(tfm.look_at([0.0, -R, 0.0], [0.0, -R + 1, 0.0]),
                     tfm.scale(0.5))
    f2 = tfm.compose(tfm.look_at([-0.5, -R + 0.5, 0.0],
                                 [0.5, -R + 0.5, 0.0]), tfm.scale(0.5))
    f3 = tfm.compose(tfm.look_at([0.0, -R + 0.5, -0.5],
                                 [0.0, -R + 0.5, 0.5], up=(0.0, 1.0, 0.0)),
                     tfm.scale(0.5))
    for f in (f1, f2, f3):
        s.add(sh.rectangle(to_world=np.asarray(f), bsdf="m"))
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 15, seed=0, max_depth=4,
                            time_sampling='gate', interpret=True)
    tp = np.asarray(out)[:, 0]
    assert np.abs(tp).sum() > 0, "no corner-reflector return"
    t_axis = (np.arange(64) + 0.5) / 64 * 0.06
    t_expect = 2 * np.linalg.norm(apex) / C + plen_ / 2
    bin_w = 0.06 / 64
    pk = int(np.abs(tp).argmax())
    assert abs(t_axis[pk] - t_expect) < 2.5 * bin_w, (
        f"retro peak at {t_axis[pk]*1e3:.1f} ms, "
        f"expected {t_expect*1e3:.1f} ms")


@pytest.mark.slow
def test_megakernel_area_transmitter():
    """AREA-kind transmitter (no WDF directivity) in the kernel: parity
    with the jnp path (tx_aperture_gain -> 1 for kind == AREA)."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, area_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import develop_signal
    C, R = 340.0, 4.0
    band = Band.from_freq(C, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(area_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                 tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tfm.compose(tfm.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                    tfm.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tfm.compose(tfm.look_at([0, -R, 0], [0, 0, 0]),
                                 tfm.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 13, seed=0, max_depth=2,
                            time_sampling='gate', interpret=True)
    tp = np.asarray(out)[:, 0] / n * 64
    a, n2 = receive(s, sd, rx, seed=5, spp=1 << 13, max_depth=2,
                    time_sampling='gate')
    tj = np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0]
    assert tp.sum() > 0
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    pk = int(tj.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)


@pytest.mark.slow
def test_megakernel_checkerboard_texture():
    """Checkerboard-textured rect target in the kernel: profile matches the
    jnp wavefront (texture_eval parity from the rect's local uv), and a
    uniform checker (c0 == c1) equals the untextured scene exactly."""
    from beifong_tpu.textures import checkerboard
    from beifong_tpu.receive import develop_signal
    import test_radar as TR

    def build(c0, c1):
        s, rx = TR._point_target_scene()
        s.add(checkerboard("chk", color0=c0, color1=c1, scale_uv=(4, 4)))
        for b in s.bsdfs:
            if b.id == "mat":
                b.texture = "chk"
        return s, rx

    s, rx = build(1.0, 0.25)
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    tp = 0.0
    tj = 0.0
    seeds = 3
    for seed in range(seeds):
        out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=seed,
                                max_depth=2, time_sampling='gate',
                                interpret=True)
        tp = tp + np.asarray(out)[:, 0] / n * 64 / seeds
        a, n2 = receive(s, sd, rx, seed=5 + seed, spp=1 << 14, max_depth=2,
                        time_sampling='gate')
        tj = tj + np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0] / seeds
    assert tp.sum() > 0
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    pk = int(tj.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)
    # uniform checker == untextured (deterministic, same seed)
    s1, rx1 = build(1.0, 1.0)
    sd1 = s1.compile()
    out1, _ = receive_pallas(s1, sd1, rx1, spp=1 << 13, seed=3, max_depth=2,
                             time_sampling='gate', interpret=True)
    s0, rx0 = TR._point_target_scene()
    sd0 = s0.compile()
    out0, _ = receive_pallas(s0, sd0, rx0, spp=1 << 13, seed=3, max_depth=2,
                             time_sampling='gate', interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), rtol=1e-6)


@pytest.mark.slow
def test_megakernel_bitmap_texture():
    """Bitmap-textured rect in the kernel (one-hot MXU gather): profile
    matches the jnp wavefront; a constant bitmap equals the equivalent
    uniform checkerboard exactly; oversized bitmaps fall back."""
    import beifong_tpu.textures as tex_mod
    from beifong_tpu.receive import develop_signal
    import test_radar as TR

    def build(img, scale=(1.0, 1.0)):
        s, rx = TR._point_target_scene()
        s.add(tex_mod.bitmap("bmp", img, scale_uv=scale))
        for b in s.bsdfs:
            if b.id == "mat":
                b.texture = "bmp"
        return s, rx

    # non-uniform 4x4 pattern: parity vs the jnp wavefront
    rng = np.random.default_rng(7)
    img = rng.uniform(0.2, 1.0, (4, 4)).astype(np.float32)
    s, rx = build(img)
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    tp = 0.0
    tj = 0.0
    seeds = 3
    for seed in range(seeds):
        out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=seed,
                                max_depth=2, time_sampling='gate',
                                interpret=True)
        tp = tp + np.asarray(out)[:, 0] / n * 64 / seeds
        a, n2 = receive(s, sd, rx, seed=5 + seed, spp=1 << 14, max_depth=2,
                        time_sampling='gate')
        tj = tj + np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0] / seeds
    assert tp.sum() > 0
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    pk = int(tj.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)

    # constant bitmap == uniform checkerboard with the same value
    # (identical draw schedule, deterministic)
    from beifong_tpu.textures import checkerboard
    sb, rxb = build(np.full((8, 8), 0.7, np.float32))
    sdb = sb.compile()
    outb, _ = receive_pallas(sb, sdb, rxb, spp=1 << 13, seed=3, max_depth=2,
                             time_sampling='gate', interpret=True)
    sc, rxc = TR._point_target_scene()
    sc.add(checkerboard("chk", color0=0.7, color1=0.7, scale_uv=(1, 1)))
    for b in sc.bsdfs:
        if b.id == "mat":
            b.texture = "chk"
    sdc = sc.compile()
    outc, _ = receive_pallas(sc, sdc, rxc, spp=1 << 13, seed=3, max_depth=2,
                             time_sampling='gate', interpret=True)
    np.testing.assert_allclose(np.asarray(outb), np.asarray(outc), rtol=1e-5)

    # oversized bitmaps fall back with a texel-budget reason
    big = np.ones((256, 256), np.float32)
    s2, rx2 = build(big)
    why2 = []
    assert not supported(s2.compile(), rx2, why2)
    assert any('texel' in w for w in why2)
    # many shapes SHARING one bitmap count its rows once (packing dedupes)
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    s3, rx3 = build(np.ones((72, 72), np.float32))
    for k in range(8):
        m = np.asarray(tfm.compose(
            tfm.look_at([0.8 * k - 3, -7.0, 0], [0, 0, 0]),
            tfm.scale(0.2)))
        s3.add(sh.rectangle(to_world=m, bsdf="mat"))
    why3 = []
    assert supported(s3.compile(), rx3, why3), why3


def test_megakernel_ambient_absorption():
    """Homogeneous ambient medium in the kernel: the echo is attenuated by
    exp(-sigma_t * total path) and matches the jnp wavefront
    (radar_path.py:233-236)."""
    from beifong_tpu.media import HomogeneousMedium
    from beifong_tpu.receive import develop_signal
    import test_radar as TR

    sigma = 0.15
    s0, rx = TR._point_target_scene()
    sd0 = s0.compile()
    out0, n = receive_pallas(s0, sd0, rx, spp=1 << 13, seed=2, max_depth=2,
                             time_sampling='gate', interpret=True)
    s1, rx1 = TR._point_target_scene()
    s1.medium = HomogeneousMedium.make(sigma_t=sigma)
    sd1 = s1.compile()
    why = []
    assert supported(sd1, rx1, why), why
    out1, _ = receive_pallas(s1, sd1, rx1, spp=1 << 13, seed=2, max_depth=2,
                             time_sampling='gate', interpret=True)
    p0 = np.asarray(out0)[:, 0]
    p1 = np.asarray(out1)[:, 0]
    pk = int(p0.argmax())
    # same seed: the per-bin attenuation is exactly exp(-sigma * path);
    # the peak bin's echo travels ~ c * t_bin
    t_axis = (np.arange(64) + 0.5) / 64 * rx.adc.sampling_time
    path = 340.0 * (t_axis[pk] - 1e-3)    # subtract pulse centre
    ratio = p1[pk] / p0[pk]
    assert ratio == pytest.approx(np.exp(-sigma * path), rel=0.1), (
        ratio, np.exp(-sigma * path))
    # jnp parity (seed-averaged: the estimator is heavy-tailed)
    tp = p1 / n * 64
    tj = 0.0
    seeds = 3
    for seed in range(1, seeds):
        o_s, _ = receive_pallas(s1, sd1, rx1, spp=1 << 13, seed=2 + seed,
                                max_depth=2, time_sampling='gate',
                                interpret=True)
        tp = tp + np.asarray(o_s)[:, 0] / n * 64
    tp = tp / seeds
    for seed in range(seeds):
        a, n2 = receive(s1, sd1, rx1, seed=7 + seed, spp=1 << 13,
                        max_depth=2, time_sampling='gate')
        tj = tj + np.asarray(develop_signal(a, n2, rx1.adc))[:, 0, 0] / seeds
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)


@pytest.mark.slow
def test_megakernel_phased_transmitter():
    """Phased-array transmitter in the kernel (in-kernel cross-WDF pair
    sum): profile matches the jnp path, and steering the beam AT vs AWAY
    from the target changes the received energy by a large factor."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, phased_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import develop_signal
    C, R = 340.0, 4.0
    band = Band.from_freq(C, 40e3, 1e3)
    wl = band.wavelength_centre
    E = 4
    # target sits ~17 deg off boresight in +x
    tgt_off = 1.2

    def build(steer_deg):
        s = sc.Scene(band=band)
        s.add(diffuse("mat", reflectance=1.0, twosided=True))
        wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=1e3,
                   is_delta=True)
        s.add(phased_transmitter("tx", wf, n_elems=E, elem_spacing=wl / 2,
                                 elem_wid=(wl / 4, wl / 4),
                                 steer_deg=steer_deg, resample_freq=True))
        aim = np.asarray(tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                     tfm.scale([2 * wl, 2 * wl, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                        sampling_time=0.06, freq_lo=39.5e3, freq_hi=40.5e3)
        rx = wigner_receiver("rx", adc, receive_type='raw')
        s.add(rx)
        aim_rx = np.asarray(tfm.compose(
            tfm.look_at([-0.3, 0, 0], [tgt_off, -R, 0]),
            tfm.scale([0.02, 0.02, 1.0])))
        s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
        tgt = np.asarray(tfm.compose(
            tfm.look_at([tgt_off, -R, 0], [0.3, 0, 0]), tfm.scale(0.4)))
        s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
        return s, rx

    # steer_deg convention: positive steers toward +x (checked against
    # tx_aperture_gain directly)
    steer_at = np.degrees(np.arcsin(
        (tgt_off - 0.3) / np.hypot(tgt_off - 0.3, R)))

    def profiles(steer):
        s, rx = build(steer)
        sd = s.compile()
        why = []
        assert supported(sd, rx, why), why
        tp = 0.0
        tj = 0.0
        for seed in range(2):
            out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=seed,
                                    max_depth=2, time_sampling='gate',
                                    interpret=True)
            tp = tp + np.asarray(out)[:, 0] / n * 64 / 2
            a, n2 = receive(s, sd, rx, seed=5 + seed, spp=1 << 14,
                            max_depth=2, time_sampling='gate')
            tj = tj + np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0] / 2
        return tp, tj

    tp_on, tj_on = profiles(steer_at)
    assert np.abs(tp_on).sum() > 0
    # the signed cross-WDF interference terms make this estimator heavy-
    # tailed: compare at the window level (peak within 2 bins, energies
    # the same order) and assert the PHYSICS via the steering contrast
    pk_p = int(np.abs(tp_on).argmax())
    pk_j = int(np.abs(tj_on).argmax())
    assert abs(pk_p - pk_j) <= 2
    lo, hi = max(pk_j - 3, 0), pk_j + 4
    e_p = np.abs(tp_on[lo:hi]).sum()
    e_j = np.abs(tj_on[lo:hi]).sum()
    assert 0.2 < e_p / e_j < 5.0, (e_p, e_j)
    # steer the beam the other way: energy collapses (array factor null
    # region) — in BOTH implementations
    tp_off, tj_off = profiles(-steer_at)
    assert np.abs(tp_off[lo:hi]).sum() < 0.5 * e_p
    assert np.abs(tj_off[lo:hi]).sum() < 0.5 * e_j


@pytest.mark.slow
def test_megakernel_phased_receiver():
    """Phased receiver in the kernel: array-extent position sampling +
    in-kernel cross-WDF weight.  A steered rx array looking at one of two
    equidistant targets picks out that target's return; profile matches
    the jnp wavefront."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, phased_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import develop_signal
    C, R = 340.0, 4.0
    band = Band.from_freq(C, 40e3, 1e3)
    wl = band.wavelength_centre
    E = 4
    off = 1.2
    steer = np.degrees(np.arcsin(off / np.hypot(off, R)))

    def build(steer_deg):
        s = sc.Scene(band=band)
        s.add(diffuse("mat", reflectance=1.0, twosided=True))
        wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=1e3,
                   is_delta=True)
        s.add(wigner_transmitter("tx", wf, resample_freq=True))
        # small (wide-beam) tx lights both targets
        aim = np.asarray(tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                     tfm.scale([0.004, 0.004, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                        sampling_time=0.06, freq_lo=39.5e3, freq_hi=40.5e3)
        rx = phased_receiver("rx", adc, n_elems=E, elem_spacing=wl / 2,
                             elem_wid=(wl / 4, wl / 4), steer_deg=steer_deg,
                             receive_type='raw')
        s.add(rx)
        aim_rx = np.asarray(tfm.compose(
            tfm.look_at([0.0, 0, 0], [0.0, -1, 0]),
            tfm.scale([1e-4, 1e-4, 1.0])))
        s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
        for sx in (-off, off):
            tgt = np.asarray(tfm.compose(
                tfm.look_at([sx, -R, 0], [0.0, 0, 0]), tfm.scale(0.4)))
            s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
        return s, rx

    s, rx = build(steer)
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    tp = 0.0
    tj = 0.0
    for seed in range(2):
        out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=seed,
                                max_depth=2, time_sampling='gate',
                                interpret=True)
        tp = tp + np.asarray(out)[:, 0] / n * 64 / 2
        a, n2 = receive(s, sd, rx, seed=9 + seed, spp=1 << 14, max_depth=2,
                        time_sampling='gate')
        tj = tj + np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0] / 2
    assert np.abs(tp).sum() > 0
    pk_p = int(np.abs(tp).argmax())
    pk_j = int(np.abs(tj).argmax())
    assert abs(pk_p - pk_j) <= 2, (pk_p, pk_j)
    lo, hi = max(pk_j - 3, 0), pk_j + 4
    e_p = np.abs(tp[lo:hi]).sum()
    e_j = np.abs(tj[lo:hi]).sum()
    assert 0.2 < e_p / e_j < 5.0, (e_p, e_j)


@pytest.mark.slow
def test_megakernel_mixer_beat():
    """`mixer` receive type in the kernel (the 4th receiver.cpp:21 mode):
    signed beat against the packed LO waveform, importance-sampled beat
    axis — the spectrum peaks at slope * 2R/c like the jnp path."""
    import test_radar as TR
    s, rx, f_beat_expect = TR._fmcw_scene('mixer')
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=3, max_depth=2,
                            time_sampling='fixed', interpret=True)
    spectrum = np.asarray(out).sum(axis=0)
    f_axis = (np.arange(128) + 0.5) / 128 * (4 * f_beat_expect)
    f_peak = f_axis[np.argmax(spectrum)]
    bin_w = 4 * f_beat_expect / 128
    assert spectrum.sum() > 0
    assert abs(f_peak - f_beat_expect) < 3 * bin_w, (
        f"kernel mixer beat at {f_peak:.1f} Hz, "
        f"expected {f_beat_expect:.1f} Hz")
    # coherent mixer now runs in-kernel: dechirp phase against the
    # packed LO (sp 39/40 pivots, mirrors _echo_phase's lo branch).
    # The peak-bin phase is MC-noisy (residual dechirp phases average
    # over the window), so pin the PHYSICS with common random numbers:
    # a quarter-wavelength target shift flips the beat phase by ~pi.
    from beifong_tpu.receive import receive as _receive, develop_signal

    def iq_at_peak(dr):
        s2, rx2, _ = TR._fmcw_scene('mixer', dR=dr)
        sd2 = s2.compile()
        outc, _nc = receive_pallas(s2, sd2, rx2, spp=1 << 14, seed=3,
                                   max_depth=2, time_sampling='fixed',
                                   interpret=True, coherent=True)
        iq = np.asarray(outc)
        z = (iq[..., 0] + 1j * iq[..., 1]).sum(axis=0)
        # jnp path peaks in the same beat bin
        a, n2 = _receive(s2, sd2, rx2, seed=11, spp=1 << 13, max_depth=2,
                         time_sampling='fixed', coherent=True)
        g = np.asarray(develop_signal(a, n2, rx2.adc))
        zj = (g[..., 0] + 1j * g[..., 1]).sum(axis=0)
        pk = int(np.abs(z).argmax())
        assert abs(pk - int(np.abs(zj).argmax())) <= 2
        return z[pk]

    band_c, f0 = 340.0, 40e3
    lam = band_c / f0
    z0 = iq_at_peak(0.0)
    z1 = iq_at_peak(lam / 4)           # 2*dR = lam/2 -> pi flip
    dphi = abs(np.angle(z1 * np.conj(z0)))
    assert abs(dphi - np.pi) < 0.6, dphi


@pytest.mark.slow
def test_megakernel_raw_resample_lo():
    """raw_resample WITH an LO: the rx frequency snaps to the LO delta in
    the kernel too (parity with the jnp rx_sample_frequency branch)."""
    import test_radar as TR
    from beifong_tpu.receive import develop_signal
    s, rx, _ = TR._fmcw_scene('raw_resample')
    import dataclasses as dc
    # bin the RECEIVED frequency over the band (raw semantics)
    rx = dc.replace(rx, adc=dc.replace(rx.adc, freq_lo=38e3, freq_hi=42e3))
    s.receivers[0] = rx
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    tp = 0.0
    tj = 0.0
    for seed in range(3):
        out, n = receive_pallas(s, sd, rx, spp=1 << 13, seed=1 + seed,
                                max_depth=2, time_sampling='fixed',
                                interpret=True)
        tp = tp + np.asarray(out).sum(axis=0)
        a, n2 = receive(s, sd, rx, seed=6 + seed, spp=1 << 13, max_depth=2,
                        time_sampling='fixed')
        tj = tj + np.asarray(develop_signal(a, n2, rx.adc)).sum(axis=0)[:, 0]
    assert tp.sum() > 0 and tj.sum() > 0
    # the LO chirp fills a broad ramp of frequency bins, so argmax is
    # fragile; compare the occupied support and the spectral centroid
    sup_p = np.nonzero(tp > 0.2 * tp.max())[0]
    sup_j = np.nonzero(tj > 0.2 * tj.max())[0]
    assert abs(int(sup_p[0]) - int(sup_j[0])) <= 2
    assert abs(int(sup_p[-1]) - int(sup_j[-1])) <= 2
    cen_p = (tp * np.arange(len(tp))).sum() / tp.sum()
    cen_j = (tj * np.arange(len(tj))).sum() / tj.sum()
    assert abs(cen_p - cen_j) <= 2.0


@pytest.mark.slow
def test_megakernel_waveform_phi0():
    """Waveform phase offset phi0 rides the kernel's coherent phase:
    a pi/2 offset rotates the peak-bin IQ by pi/2 (parity with
    radar_path.py:455's phi0 term), using common random numbers."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import receive as _receive, develop_signal
    C, R = 340.0, 4.0
    band = Band.from_freq(C, 40e3, 1e3)

    def iq_at_peak(phi0):
        s = sc.Scene(band=band)
        s.add(diffuse("mat", reflectance=1.0, twosided=True))
        wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=1e3,
                   is_delta=True, phi0=phi0)
        s.add(wigner_transmitter("tx", wf, resample_freq=True))
        aim = np.asarray(tfm.compose(tfm.look_at([0, 0, 0], [0, -1, 0]),
                                     tfm.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                        sampling_time=0.06, freq_lo=39.5e3, freq_hi=40.5e3)
        rx = wigner_receiver("rx", adc, receive_type='raw')
        s.add(rx)
        aim_rx = np.asarray(tfm.compose(tfm.look_at([0, -0.2, 0], [0, -4, 0]),
                                        tfm.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
        tgt = np.asarray(tfm.compose(tfm.look_at([0, -R, 0], [0, 0, 0]),
                                     tfm.scale(0.4)))
        s.add(sh.rectangle(to_world=tgt, bsdf="mat"))
        sd = s.compile()
        why = []
        assert supported(sd, rx, why), why
        out, _ = receive_pallas(s, sd, rx, spp=1 << 13, seed=5, max_depth=2,
                                time_sampling='gate', interpret=True,
                                coherent=True)
        iq = np.asarray(out)
        z = iq[:, 0, 0] + 1j * iq[:, 0, 1]
        a, n2 = _receive(s, sd, rx, seed=7, spp=1 << 13, max_depth=2,
                         time_sampling='gate', coherent=True)
        g_ = np.asarray(develop_signal(a, n2, rx.adc))
        zj = g_[:, 0, 0] + 1j * g_[:, 0, 1]
        pk = int(np.abs(z).argmax())
        assert abs(pk - int(np.abs(zj).argmax())) <= 1
        return z[pk], zj[pk]

    z0, zj0 = iq_at_peak(0.0)
    z1, zj1 = iq_at_peak(np.pi / 2)
    # kernel: phi0 rotates the echo by phi0 (common random numbers)
    dphi = np.angle(z1 * np.conj(z0))
    assert abs(dphi - np.pi / 2) < 0.3, dphi
    # jnp path agrees on the same rotation
    dphi_j = np.angle(zj1 * np.conj(zj0))
    assert abs(dphi - dphi_j) < 0.3, (dphi, dphi_j)


@pytest.mark.slow
def test_megakernel_mirror_fresnel_amplitude():
    """Regression: a conductor-ONLY scene (no rough conductor present) must
    apply the real conductor Fresnel to the mirror bounce — the eta/k lane
    tracking used to be gated on the GGX flag, silently giving F = 1."""
    import inspect
    import test_pallas_receive as _self
    # reuse the specular-flash scene with a low-reflectivity conductor
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import conductor
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.receive import develop_signal
    C, R, plen_ = 340.0, 4.0, 2e-3
    band = Band.from_freq(C, 40e3, 10e3)

    def build(eta, kk):
        s = sc.Scene(band=band)
        s.add(conductor("mirror", eta=eta, k=kk, twosided=True))
        wf = pulse(f_centre=40e3, prf=10.0, pulse_len=plen_, f_ext=2e3,
                   is_delta=True)
        s.add(wigner_transmitter("tx", wf, resample_freq=True))
        aim = np.asarray(tfm.compose(tfm.look_at([0.0, 0, 0], [0.0, -1, 0]),
                                     tfm.scale([0.5, 0.5, 1.0])))
        s.add(sh.rectangle(to_world=aim, transmitter="tx"))
        adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                        sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
        rx = wigner_receiver("rx", adc, receive_type='raw')
        s.add(rx)
        aim_rx = np.asarray(tfm.compose(tfm.look_at([0.0, -0.3, 0],
                                                    [0.0, -4, 0]),
                                        tfm.scale([0.02, 0.02, 1.0])))
        s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
        tgt = np.asarray(tfm.compose(tfm.look_at([0, -R, 0], [0, 0, 0]),
                                     tfm.scale(1.5)))
        s.add(sh.rectangle(to_world=tgt, bsdf="mirror"))
        return s, rx

    def flash_energy(eta, kk, seed=0):
        s, rx = build(eta, kk)
        sd = s.compile()
        out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=seed,
                                max_depth=2, time_sampling='gate',
                                interpret=True)
        tp = np.asarray(out)[:, 0]
        pk = int(np.abs(tp).argmax())
        return np.abs(tp[max(pk - 3, 0):pk + 4]).sum()

    # near-normal incidence Fresnel: eta=0.2,k=3 -> F ~ 0.95+;
    # eta=2,k=0.5 -> noticeably lossier.  Same stream, same geometry: the
    # energy ratio must track the Fresnel ratio, NOT be 1.0
    from beifong_tpu.bsdf.eval import fresnel_conductor
    import jax.numpy as jnp
    F_hi = float(fresnel_conductor(jnp.asarray([1.0]), jnp.asarray([[0.2]]),
                                   jnp.asarray([[3.0]]))[0, 0])
    F_lo = float(fresnel_conductor(jnp.asarray([1.0]), jnp.asarray([[2.0]]),
                                   jnp.asarray([[0.5]]))[0, 0])
    e_hi = flash_energy(0.2, 3.0)
    e_lo = flash_energy(2.0, 0.5)
    assert e_hi > 0 and e_lo > 0
    ratio = e_lo / e_hi
    expect = F_lo / F_hi
    assert ratio == pytest.approx(expect, rel=0.05), (ratio, expect)


@pytest.mark.slow
def test_megakernel_polarized_stokes():
    """Polarized Stokes in the kernel (in-kernel Mueller chain): the
    45-degree conductor plate polarizes an unpolarized tx along the s axis
    with DoP = |B|/A from mueller.specular_reflection; a diffuse plate
    depolarizes; S0 equals the unpolarized kernel run exactly (same
    stream)."""
    import jax.numpy as jnp
    from beifong_tpu import scene as sc, mueller as mu
    from beifong_tpu.bsdf import diffuse, conductor
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tf
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    C = 340.0
    band = Band.from_freq(C, 40e3, 10e3)
    eta, kk = 2.0, 1.0

    def build(mat):
        s = sc.Scene(band=band)
        s.add(conductor("cond", eta=eta, k=kk, twosided=True))
        s.add(diffuse("diff", reflectance=1.0, twosided=True))
        wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
                   is_delta=True)
        s.add(wigner_transmitter("tx", wf, resample_freq=True))
        # the conductor path is mirror -> DIRECT tx hit (NEE is zero on a
        # mirror), so the tx aperture must be large enough to catch the
        # reflected beam
        aim_tx = np.asarray(tf.compose(
            tf.look_at([0, 0, -5], [0, 0, 0], up=(0, 1, 0)),
            tf.scale([1.0, 1.0, 1.0])))
        s.add(sh.rectangle(to_world=aim_tx, transmitter="tx"))
        adc = ADCConfig(n_time=32, n_freq=1, sampling_start=0.0,
                        sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
        rx = wigner_receiver("rx", adc, receive_type='raw')
        s.add(rx)
        aim_rx = np.asarray(tf.compose(tf.look_at([0, -5, 0], [0, 0, 0]),
                                       tf.scale([0.05, 0.05, 1.0])))
        s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
        aim_p = np.asarray(tf.compose(tf.look_at([0, 0, 0], [0, -1, -1]),
                                      tf.scale(1.0)))
        s.add(sh.rectangle(to_world=aim_p, bsdf=mat))
        return s, rx

    s, rx = build("cond")
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    out, n = receive_pallas(s, sd, rx, spp=1 << 14, seed=9, max_depth=2,
                            time_sampling='gate', interpret=True,
                            polarized=True)
    stokes = np.asarray(out).sum(axis=(0, 1))
    # giant coherent apertures make the scalar weights signed/heavy-tailed
    # at test spp, but every lane shares the SAME 45-degree polarization
    # structure, so the Stokes RATIOS are exact regardless of sum sign
    assert abs(stokes[0]) > 0
    m = np.asarray(mu.specular_reflection(
        jnp.asarray(np.cos(np.pi / 4)), jnp.asarray(eta), jnp.asarray(kk)))
    expected_s1 = m[1, 0] / m[0, 0]
    got_s1 = stokes[1] / stokes[0]
    assert abs(got_s1 - expected_s1) < 0.1, (got_s1, expected_s1)
    # small S2 leakage from off-plane lanes (the kernel's plain-cosine rx
    # sampling spreads wider than the jnp mixture sampler)
    assert abs(stokes[2] / stokes[0]) < 0.08
    assert abs(stokes[3] / stokes[0]) < 0.08
    # S0 == unpolarized kernel run, same stream, exactly
    out0, _ = receive_pallas(s, sd, rx, spp=1 << 14, seed=9, max_depth=2,
                             time_sampling='gate', interpret=True)
    np.testing.assert_allclose(np.asarray(out)[..., 0], np.asarray(out0),
                               rtol=1e-5)
    # diffuse plate depolarizes
    s2, rx2 = build("diff")
    sd2 = s2.compile()
    out_d, _ = receive_pallas(s2, sd2, rx2, spp=1 << 13, seed=9, max_depth=2,
                              time_sampling='gate', interpret=True,
                              polarized=True)
    st_d = np.asarray(out_d).sum(axis=(0, 1))
    assert abs(st_d[0]) > 0
    # per-lane depolarization zeroes S1..S3 exactly, so the DoP ratio is
    # sign-robust even when the scalar sum is noise-signed
    dop_ = np.sqrt(st_d[1] ** 2 + st_d[2] ** 2 + st_d[3] ** 2) / abs(st_d[0])
    assert dop_ < 0.05, dop_


def _kernel_vs_jnp_profiles(s, rx, spp=1 << 14, seeds=3, max_depth=3):
    """Seed-averaged fast-time profiles from the interpret kernel and the
    jnp wavefront for the same scene (shared helper for scope tests)."""
    from beifong_tpu.receive import develop_signal
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), why
    tp = 0.0
    tj = 0.0
    for seed in range(seeds):
        out, n = receive_pallas(s, sd, rx, spp=spp, seed=seed,
                                max_depth=max_depth, time_sampling='gate',
                                interpret=True)
        tp = tp + np.asarray(out)[:, 0] / n * rx.adc.n_time / seeds
        a, n2 = receive(s, sd, rx, seed=50 + seed, spp=spp,
                        max_depth=max_depth, time_sampling='gate')
        tj = tj + np.asarray(develop_signal(a, n2, rx.adc))[:, 0, 0] / seeds
    return tp, tj


@pytest.mark.slow
@pytest.mark.parametrize("shape_kind", ["disk", "cylinder"])
def test_megakernel_disk_cylinder(shape_kind):
    """Disk and cylinder analytic prims in the kernel (reference GPU-mode
    intersectors `src/shapes/optix/disk.cuh`, `cylinder.cuh`): the return
    peaks at the geometric round trip and matches the jnp wavefront."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, omni_receiver,
                                   ADCConfig)

    band = Band.from_freq(340.0, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    s.add(sh.rectangle(to_world=np.asarray(
        tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                    tfm.scale([0.05, 0.05, 1.0]))), transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = omni_receiver("rx", adc, position=(-0.3, 0, 0), receive_type='raw')
    s.add(rx)
    c = 340.0
    if shape_kind == "disk":
        s.add(sh.disk(to_world=np.asarray(
            tfm.compose(tfm.look_at([0, -4.0, 0], [0, 0, 0]),
                        tfm.scale(0.5))), bsdf="mat"))
        r_t = 4.0
    else:
        # vertical cylinder on the tx boresight; near surface at 4 - 0.3 m
        s.add(sh.cylinder(to_world=np.asarray(
            tfm.compose(tfm.translate([0.0, -4.0, -0.6]),
                        tfm.scale([0.3, 0.3, 1.2]))), bsdf="mat"))
        r_t = 4.0 - 0.3

    tp, tj = _kernel_vs_jnp_profiles(s, rx, max_depth=2)
    assert tp.sum() > 0 and tj.sum() > 0
    bin_t = int(round(2 * r_t / c / 0.06 * 64 - 0.5))
    # geometric anchor: peak within the first couple of bins past the
    # near-surface round trip (curved surfaces smear the return outward)
    for prof in (tp, tj):
        assert bin_t - 1 <= int(prof.argmax()) <= bin_t + 3, (
            shape_kind, prof.argmax(), bin_t)
    assert abs(int(tp.argmax()) - int(tj.argmax())) <= 1
    pk = int(tj.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)


@pytest.mark.slow
def test_megakernel_dielectric_window():
    """Thin-dielectric window in front of a trihedral corner reflector:
    the echo is a pure DELTA chain (window transmit -> three mirror
    bounces -> window transmit -> direct tx hit), so the estimator is
    deterministic per lane — peak bin unchanged vs no window, amplitude
    attenuated by the window round trip, kernel matches jnp.  A smooth
    DIELECTRIC interface at the same pose also runs in-kernel (delta
    reflect+refract, `bsdf/eval.py:277-347` parity)."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import (conductor, thin_dielectric, dielectric)
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter,
                                   wigner_receiver, ADCConfig)

    def corner_scene(window=None):
        fc = 40e3
        band = Band.from_freq(340.0, fc, 10e3)
        s = sc.Scene(band=band)
        s.add(conductor("m", eta=0.2, k=3.0, twosided=True))
        wf = pulse(f_centre=fc, prf=10.0, pulse_len=2e-3, f_ext=2e3,
                   is_delta=True)
        s.add(wigner_transmitter("tx", wf, resample_freq=True))
        s.add(sh.rectangle(to_world=np.asarray(
            tfm.compose(tfm.look_at([0.0, 0, 0], [0.0, -1, 0]),
                        tfm.scale([0.8, 0.8, 1.0]))), transmitter="tx"))
        adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                        sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
        rx = wigner_receiver("rx", adc, receive_type="raw")
        s.add(rx)
        rx_pos = np.array([0.0, -0.1, 0.0])
        apex = np.array([0.0, -4.0, 0.0])
        s.add(sh.rectangle(to_world=np.asarray(
            tfm.compose(tfm.look_at(rx_pos, apex),
                        tfm.scale([0.02, 0.02, 1.0]))), receiver="rx"))
        for f in sh.trihedral(apex, rx_pos - apex, bsdf="m"):
            s.add(f)
        if window is not None:
            s.add(window)
            s.add(sh.rectangle(to_world=np.asarray(
                tfm.compose(tfm.look_at([0.0, -2.0, 0], [0, 0, 0]),
                            tfm.scale(2.0))), bsdf="win"))
        return s, rx

    def profiles(s, rx, depth):
        return _kernel_vs_jnp_profiles(s, rx, spp=1 << 13, seeds=2,
                                       max_depth=depth)

    s0, rx0 = corner_scene()
    tp0, tj0 = profiles(s0, rx0, 6)   # same depth as the windowed runs
    pk0 = int(tj0.argmax())
    assert abs(int(tp0.argmax()) - pk0) <= 1

    s1, rx1 = corner_scene(thin_dielectric("win", int_ior=1.5))
    tp1, tj1 = profiles(s1, rx1, 6)   # +2 window transmits in the chain
    assert abs(int(tp1.argmax()) - pk0) <= 1
    assert abs(int(tj1.argmax()) - pk0) <= 1
    lo, hi = max(pk0 - 3, 0), pk0 + 4
    r_k = tp1[lo:hi].sum() / tp0[lo:hi].sum()
    r_j = tj1[lo:hi].sum() / tj0[lo:hi].sum()
    # The PHYSICS anchor here is the time-of-flight: the 6-segment
    # window-transmit chain must land in the corner's round-trip bin in
    # BOTH paths (asserted above).  Amplitude is physically ~0.92 (two
    # window transmits) but the signed-WDF corner estimator is extremely
    # heavy-tailed at test spp (measured per-seed ratios 0.67..2.6 in
    # both kernel and jnp; seed means 0.86/1.2) — so only a structural
    # order-of-magnitude guard is meaningful (catches double counting /
    # wrong Fresnel, not MC noise).
    assert 0.05 < r_k < 5.0, r_k
    assert 0.05 < r_j < 5.0, r_j

    s2, rx2 = corner_scene(dielectric("win", int_ior=1.5,
                                      specular_transmittance=1.0))
    tp2, tj2 = profiles(s2, rx2, 6)
    # signed WDF weights: the GLOBAL sum can be negative; presence =
    # nonzero magnitude
    assert np.abs(tp2).sum() > 0 and np.abs(tj2).sum() > 0
    # the profile has TWO features: the window's specular flash (~bin 12)
    # and the refracted corner chain at the round-trip bin — their
    # relative magnitude is estimator-noisy, so compare the CORNER BAND
    # directly: present in both paths, within an order of magnitude of
    # the unwindowed corner (|.|: signed WDF)
    e_k2 = np.abs(tp2[lo:hi]).sum()
    e_j2 = np.abs(tj2[lo:hi]).sum()
    assert e_k2 > 0.05 * np.abs(tp2).max(), (e_k2, np.abs(tp2).max())
    assert e_j2 > 0.05 * np.abs(tj2).max(), (e_j2, np.abs(tj2).max())
    r2_k = e_k2 / np.abs(tp0[lo:hi]).sum()
    assert 0.05 < r2_k < 5.0, r2_k


@pytest.mark.slow
def test_megakernel_cpi_scan_parity():
    """Kernel-rate CPI (`receive_cpi_pallas`: one lax.scan over per-pulse
    packed tables) is BIT-IDENTICAL to running the megakernel once per
    pulse on the same snapshots, and `receive_cpi(engine='pallas')`
    returns it in the film cube layout."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.transform import AnimatedTransform
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (cw, wigner_transmitter, wigner_receiver,
                                   ADCConfig)
    from beifong_tpu.integrators.pallas_receive import receive_cpi_pallas
    from beifong_tpu.receive import receive_cpi

    fc = 40e3
    n_pulses, prf = 4, 400.0
    band = Band.from_freq(340.0, fc, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    s.add(wigner_transmitter("tx", cw(f_centre=fc), resample_freq=True))
    s.add(sh.rectangle(to_world=np.asarray(
        tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                    tfm.scale([0.05, 0.05, 1.0]))), transmitter="tx"))
    adc = ADCConfig(n_time=8, n_freq=1, sampling_start=0.0,
                    sampling_time=2e-3, freq_lo=fc - 2e3, freq_hi=fc + 2e3)
    rx = wigner_receiver("rx", adc, receive_type="raw")
    s.add(rx)
    s.add(sh.rectangle(to_world=np.asarray(
        tfm.compose(tfm.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                    tfm.scale([0.05, 0.05, 1.0]))), receiver="rx"))
    tgt = sh.rectangle(bsdf="mat")
    frames = [(p / prf, np.asarray(
        tfm.compose(tfm.look_at(
            [0.002 * np.cos(p), -(4.0 + 0.002 * np.sin(p)), 0.0],
            [0, 0, 0]), tfm.scale(0.3)))) for p in range(n_pulses + 1)]
    tgt.to_world = AnimatedTransform.from_keyframes(frames)
    s.add(tgt)

    cube, n = receive_cpi_pallas(s, n_pulses=n_pulses, prf=prf, seed=11,
                                 spp=1 << 12, max_depth=1,
                                 time_sampling='gate', coherent=True,
                                 interpret=True)
    cube = np.asarray(cube)
    assert cube.shape == (n_pulses, 8, 1, 2)
    for p in range(n_pulses):
        snap = s.at_time(p / prf)
        out, n2 = receive_pallas(snap, snap.compile(), snap.receivers[0],
                                 spp=1 << 12, seed=11, max_depth=1,
                                 time_sampling='gate', coherent=True,
                                 interpret=True)
        assert n2 == n
        np.testing.assert_array_equal(cube[p], np.asarray(out))

    # engine='pallas' glue: film cube layout (zero weight/count channels)
    cube2, n3 = receive_cpi(s, n_pulses=n_pulses, prf=prf, seed=11,
                            coherent=True, engine='pallas', spp=1 << 12,
                            max_depth=1, time_sampling='gate')
    cube2 = np.asarray(cube2)
    assert n3 == n and cube2.shape == (n_pulses, 8, 1, 4)
    np.testing.assert_array_equal(cube2[..., :2], cube)
    assert (cube2[..., 2:] == 0).all()


@pytest.mark.slow
def test_megakernel_cpi_mesh_scan_parity():
    """Kernel CPI over a MESH scene (VERDICT r4 #4): the per-pulse packed
    BVH tables ride the scan axis (rigid translation keeps the tree
    topology), bit-identical to running the mesh megakernel once per
    pulse on the same snapshots."""
    from beifong_tpu.geometry.mesh import MeshSpec, make_grid
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.transform import AnimatedTransform
    from beifong_tpu.integrators.pallas_receive import receive_cpi_pallas

    n_pulses, prf = 3, 400.0
    s, rx = _mesh_scene(n_side=4)
    # replace the static mesh with a closing (translating) one: rebuild
    # the scene with an AnimatedTransform on the mesh target
    mesh_spec = next(sp for sp in s.shapes if isinstance(sp, MeshSpec))
    s.shapes.remove(mesh_spec)
    v, f = make_grid(4, 4)
    v = np.asarray(v, np.float32)
    v[:, 2] = 0.05 * np.sin(4 * v[:, 0]) * np.cos(3 * v[:, 1])
    tgt = MeshSpec(v, np.asarray(f), bsdf="mat")
    frames = [(p / prf, np.asarray(
        tfm.compose(tfm.look_at([0, -(4.0 - 0.02 * p), 0], [0, 0, 0]),
                    tfm.scale(0.6)))) for p in range(n_pulses + 1)]
    tgt.to_world = AnimatedTransform.from_keyframes(frames)
    s.add(tgt)

    cube, n = receive_cpi_pallas(s, n_pulses=n_pulses, prf=prf, seed=11,
                                 spp=1 << 12, max_depth=1,
                                 time_sampling='gate', coherent=True,
                                 interpret=True)
    cube = np.asarray(cube)
    assert cube.shape == (n_pulses, 64, 1, 2)
    assert np.abs(cube).sum() > 0
    for p in range(n_pulses):
        snap = s.at_time(p / prf)
        out, n2 = receive_pallas(snap, snap.compile(), snap.receivers[0],
                                 spp=1 << 12, seed=11, max_depth=1,
                                 time_sampling='gate', coherent=True,
                                 interpret=True)
        assert n2 == n
        np.testing.assert_array_equal(cube[p], np.asarray(out))


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["plastic", "rough_plastic"])
def test_megakernel_plastic(kind):
    """Plastic / rough-plastic targets in the kernel: peak bin and
    peak-window energy match the jnp wavefront (bsdf/eval.py two-lobe
    model: diffuse base x (1-Fi)(1-Fo) + coat)."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import plastic, rough_plastic
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, omni_receiver,
                                   ADCConfig)

    band = Band.from_freq(340.0, 40e3, 10e3)
    s = sc.Scene(band=band)
    if kind == "plastic":
        s.add(plastic("mat", diffuse_reflectance=0.8, int_ior=1.49,
                      twosided=True))
    else:
        s.add(rough_plastic("mat", diffuse_reflectance=0.8, alpha=0.4,
                            int_ior=1.49, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    s.add(sh.rectangle(to_world=np.asarray(
        tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                    tfm.scale([0.05, 0.05, 1.0]))), transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = omni_receiver("rx", adc, position=(-0.3, 0, 0), receive_type='raw')
    s.add(rx)
    s.add(sh.rectangle(to_world=np.asarray(
        tfm.compose(tfm.look_at([0, -4.0, 0], [0, 0, 0]), tfm.scale(0.5))),
        bsdf="mat"))

    tp, tj = _kernel_vs_jnp_profiles(s, rx, max_depth=2)
    assert tp.sum() > 0 and tj.sum() > 0
    bin_t = int(round(2 * 4.0 / 340.0 / 0.06 * 64 - 0.5))
    for prof in (tp, tj):
        assert bin_t - 1 <= int(prof.argmax()) <= bin_t + 3, prof.argmax()
    pk = int(tj.argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)


@pytest.mark.slow
@pytest.mark.parametrize("case", ["target", "through"])
def test_megakernel_rough_dielectric(case):
    """GGX rough glass in the kernel (bsdf/eval.py:169-199 Walter lobes;
    reference `src/bsdfs/roughdielectric.cpp`).  `target`: backscatter off
    a rough slab lands in the slab's round-trip bin in both the interpret
    kernel and the jnp wavefront.  `through`: tx and rx on OPPOSITE sides
    of the sheet — the echo exists only via the TRANSMISSION lobe, at the
    rx->sheet->tx one-way time of flight."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import rough_dielectric
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, omni_receiver,
                                   ADCConfig)

    band = Band.from_freq(340.0, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(rough_dielectric("mat", alpha=0.4, int_ior=1.5))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    if case == "target":
        s.add(sh.rectangle(to_world=np.asarray(
            tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                        tfm.scale([0.05, 0.05, 1.0]))), transmitter="tx"))
        rx = omni_receiver("rx", adc, position=(-0.3, 0, 0),
                           receive_type='raw')
        s.add(rx)
        s.add(sh.rectangle(to_world=np.asarray(
            tfm.compose(tfm.look_at([0, -4.0, 0], [0, 0, 0]),
                        tfm.scale(0.5))), bsdf="mat"))
        t_bin = 2 * 4.0 / 340.0            # round trip
    else:
        # sheet between tx (y=0 side) and rx (y=-4 side): only the
        # refracted lobe connects them
        s.add(sh.rectangle(to_world=np.asarray(
            tfm.compose(tfm.look_at([0.0, 0, 0], [0.0, -1, 0]),
                        tfm.scale([0.05, 0.05, 1.0]))), transmitter="tx"))
        rx = omni_receiver("rx", adc, position=(0.0, -4.0, 0),
                           receive_type='raw')
        s.add(rx)
        s.add(sh.rectangle(to_world=np.asarray(
            tfm.compose(tfm.look_at([0, -2.0, 0], [0, 0, 0]),
                        tfm.scale(1.0))), bsdf="mat"))
        t_bin = 4.0 / 340.0                # one-way through the sheet

    tp, tj = _kernel_vs_jnp_profiles(s, rx, max_depth=2)
    assert np.abs(tp).sum() > 0 and np.abs(tj).sum() > 0
    bin_t = int(round(t_bin / 0.06 * 64 - 0.5))
    for prof in (tp, tj):
        assert bin_t - 2 <= int(np.abs(prof).argmax()) <= bin_t + 3, \
            (case, np.abs(prof).argmax(), bin_t)
    pk = int(np.abs(tj).argmax())
    lo, hi = max(pk - 3, 0), pk + 4
    assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.6)


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["blend", "mask"])
def test_megakernel_blend_mask(kind):
    """BLEND / MASK composites in the kernel (VERDICT r4 #8; reference
    `src/bsdfs/blendbsdf.cpp` / `mask.cpp`): NEE evaluates the lobe mix
    w*f0 + (1-w)*f1 (mask: w*f_nested), the bounce picks a lobe per lane
    (mask pass-through = delta null transmission), matching the jnp
    wavefront's round-trip profile.  The mask case also pins the physics:
    halving opacity halves the echo energy."""
    from beifong_tpu import scene as sc
    from beifong_tpu.bsdf import diffuse, rough_conductor
    from beifong_tpu.bsdf.tables import blend as blend_spec, mask as mask_spec
    from beifong_tpu.geometry import shapes as sh
    from beifong_tpu.core import transform as tfm
    from beifong_tpu.core.config import Band
    from beifong_tpu.radar import (pulse, wigner_transmitter, omni_receiver,
                                   ADCConfig)

    def build(mat_specs, mat_id):
        band = Band.from_freq(340.0, 40e3, 10e3)
        s = sc.Scene(band=band)
        for m in mat_specs:
            s.add(m)
        wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
                   is_delta=True)
        s.add(wigner_transmitter("tx", wf, resample_freq=True))
        s.add(sh.rectangle(to_world=np.asarray(
            tfm.compose(tfm.look_at([0.3, 0, 0], [0.3, -1, 0]),
                        tfm.scale([0.05, 0.05, 1.0]))), transmitter="tx"))
        adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                        sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
        rx = omni_receiver("rx", adc, position=(-0.3, 0, 0),
                           receive_type='raw')
        s.add(rx)
        s.add(sh.rectangle(to_world=np.asarray(
            tfm.compose(tfm.look_at([0, -4.0, 0], [0, 0, 0]),
                        tfm.scale(0.5))), bsdf=mat_id))
        return s, rx

    if kind == "blend":
        mats = [diffuse("d0", reflectance=1.0, twosided=True),
                rough_conductor("m1", alpha=0.3, eta=0.2, k=3.0,
                                twosided=True),
                blend_spec("mat", "d0", "m1", weight=0.6)]
        s, rx = build(mats, "mat")
        tp, tj = _kernel_vs_jnp_profiles(s, rx, max_depth=2)
        assert tp.sum() > 0 and tj.sum() > 0
        bin_t = int(round(2 * 4.0 / 340.0 / 0.06 * 64 - 0.5))
        for prof in (tp, tj):
            assert bin_t - 1 <= int(prof.argmax()) <= bin_t + 3
        pk = int(tj.argmax())
        lo, hi = max(pk - 3, 0), pk + 4
        assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(), rel=0.4)
    else:
        def energy(op):
            mats = [diffuse("d0", reflectance=1.0, twosided=True),
                    mask_spec("mat", "d0", opacity=op)]
            s, rx = build(mats, "mat")
            tp, tj = _kernel_vs_jnp_profiles(s, rx, max_depth=2)
            pk = int(tj.argmax())
            lo, hi = max(pk - 3, 0), pk + 4
            assert tp[lo:hi].sum() == pytest.approx(tj[lo:hi].sum(),
                                                    rel=0.4), op
            return tp[lo:hi].sum()

        e_hi = energy(0.8)
        e_lo = energy(0.4)
        assert e_lo / e_hi == pytest.approx(0.5, rel=0.3)
