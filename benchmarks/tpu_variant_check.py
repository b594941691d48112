"""Compile-check late megakernel variants on the real TPU.

Interpret mode (CPU) already pins the physics of these variants; this
script proves the Mosaic compile + execution on hardware for the variant
flags added late in round 2: polarized Stokes transport and bitmap
textures (one-hot MXU gather).  Run whenever the kernel gains a new
static flag — op classes that compiled before can still break in new
combinations (layout/SMEM pressure).
"""
import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from beifong_tpu import scene as sc
from beifong_tpu.bsdf import diffuse, conductor
from beifong_tpu.geometry import shapes as sh
from beifong_tpu.core import transform as tf
from beifong_tpu.core.config import Band
from beifong_tpu.radar import (pulse, wigner_transmitter, wigner_receiver,
                               ADCConfig)
from beifong_tpu import textures as tex_mod
from beifong_tpu.integrators.pallas_receive import receive_pallas, supported


def base_scene(R=4.0, target_bsdf="mat"):
    band = Band.from_freq(340.0, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(diffuse("mat", reflectance=1.0, twosided=True))
    s.add(conductor("metal", eta=1.5, k=3.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    aim = np.asarray(tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
                                tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim, transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    aim_rx = np.asarray(tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
                                   tf.scale([0.05, 0.05, 1.0])))
    s.add(sh.rectangle(to_world=aim_rx, receiver="rx"))
    tgt = np.asarray(tf.compose(tf.look_at([0, -R, 0], [0, 0, 0]),
                                tf.scale(0.5)))
    s.add(sh.rectangle(to_world=tgt, bsdf=target_bsdf))
    return s, rx, band


def expected_peak(rx, R=4.0):
    c = 340.0
    tau = 2 * R / c
    return int(round(tau / rx.adc.sampling_time * rx.adc.n_time - 0.5))


def smear_bins(rx, pulse_len=2e-3):
    """Gate-mode emission time is uniform over the pulse support, so the
    echo occupies [tau, tau + pulse_len]: at 64 bins that is ~2 bins and
    the +-2 peak tolerance hides it, at 1024 bins it is ~34 bins and the
    peak (WDF-weighted, at the pulse centre) must be allowed to sit
    anywhere in the smear window."""
    import math
    return math.ceil(pulse_len / rx.adc.sampling_time * rx.adc.n_time)


def run(tag, s, rx, max_depth=2, **kw):
    sd = s.compile()
    why = []
    assert supported(sd, rx, why), (tag, why)
    t0 = time.perf_counter()
    out, n = receive_pallas(s, sd, rx, spp=1 << 20, seed=0,
                            max_depth=max_depth,
                            time_sampling='gate', **kw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    a = np.asarray(out)
    prof = a[..., 0] if a.ndim == 3 else a
    # sum over freq bins: column 0 is the 35 kHz band edge whose tent
    # weight is marginal — the time profile is what the peak test pins
    pk = int(prof.sum(axis=1).argmax())
    exp = expected_peak(rx)
    hi = exp + smear_bins(rx)
    print(f"{tag}: compile+run {dt:.1f}s  peak bin {pk} "
          f"(expect in [{exp}, {hi}])  finite={np.isfinite(a).all()}",
          flush=True)
    assert np.isfinite(a).all(), tag
    assert exp - 2 <= pk <= hi + 2, (tag, pk, exp, hi)
    return a


print("devices:", jax.devices(), flush=True)

# 1) polarized Stokes (conductor target polarizes; S0 > 0, |S1..3| <= S0)
s, rx, _ = base_scene(target_bsdf="metal")
a = run("polarized", s, rx, polarized=True)
s0 = a[..., 0].sum()
assert s0 > 0
assert np.all(np.abs(a[..., 1:]).sum(0) <= a[..., 0].sum(0) * (1 + 1e-3))

# 2) bitmap texture (one-hot MXU gather) — deliberately NOT 8-row
# aligned (12x9) to exercise the padded-block slice on hardware
s, rx, _ = base_scene()
img = np.random.default_rng(0).uniform(0.3, 1.0, (12, 9)).astype(np.float32)
s.add(tex_mod.bitmap("bmp", img))
for b in s.bsdfs:
    if b.id == "mat":
        b.texture = "bmp"
run("bitmap12x9", s, rx)

# 3) bitmap + checker + conductor in one scene (flag combination)
s, rx, _ = base_scene()
s.add(tex_mod.bitmap("bmp", img))
s.add(tex_mod.checkerboard("chk", color0=1.0, color1=0.4, scale_uv=(4, 4)))
for b in s.bsdfs:
    if b.id == "mat":
        b.texture = "bmp"
tgt2 = np.asarray(tf.compose(tf.look_at([1.2, -3.4, 0], [0, 0, 0]),
                             tf.scale(0.4)))
s.add(sh.rectangle(to_world=tgt2, bsdf="metal"))
run("bitmap+mirror", s, rx)

# 4) rect demotion: 70 clutter rects -> BVH (mesh path, deduped rows)
s, rx, _ = base_scene()
rng = np.random.default_rng(0)
for k in range(70):
    m = np.asarray(tf.compose(
        tf.look_at([float(rng.uniform(-2.5, 2.5)),
                    float(rng.uniform(-9.0, -5.5)),
                    float(rng.uniform(-2.0, 2.0))], [0, 0, 0]),
        tf.scale(0.12)))
    s.add(sh.rectangle(to_world=m, bsdf="mat"))
run("demotion70", s, rx)

# 5) multi-body meshes: two bodies, distinct velocity + lobe rows
from beifong_tpu.geometry.mesh import MeshSpec, make_grid
from beifong_tpu.bsdf import rough_conductor
s, rx, _ = base_scene()
s.add(rough_conductor("rc", specular_reflectance=1.0, alpha=0.3,
                      eta=1.5, k=3.0, twosided=True))
v, fc_ = make_grid(9, 9)
v = np.asarray(v, np.float32)
m1 = np.asarray(tf.compose(tf.look_at([0, -6.0, 1.5], [0, 0, 0]),
                           tf.scale(0.6)))
spec = MeshSpec(v, np.asarray(fc_), bsdf="rc", to_world=m1)
spec.velocity = np.asarray([0.0, 3.0, 0.0], np.float32)
s.add(spec)
m2 = np.asarray(tf.compose(tf.look_at([0, -7.0, -1.5], [0, 0, 0]),
                           tf.scale(0.6)))
s.add(MeshSpec(v, np.asarray(fc_), bsdf="mat", to_world=m2))
run("multibody", s, rx)

# 6) layered (z-stratified) ambient medium: unrolled ReLU tau terms
from beifong_tpu.media import LayeredMedium
s, rx, _ = base_scene()
s.medium = LayeredMedium.make(
    np.linspace(0.05, 0.0, 8).astype(np.float32), z_min=-2.0, z_max=2.0)
run("layered8", s, rx)

# 7) large fast-time-only grid (1024 bins): 1-D MXU splat (keepdims
# lane-sum; past the 512-cell unroll cap)
import dataclasses as dc
s, rx, _ = base_scene()
rx = dc.replace(rx, adc=dc.replace(rx.adc, n_time=1024))
s.receivers[0] = rx
run("adc1024x1", s, rx)

# 8) 2-D grid at the MXU-splat cell cap (512x64 = 32768 cells):
# dot_general with a real frequency tent factor at scale
s, rx, _ = base_scene()
rx = dc.replace(rx, adc=dc.replace(rx.adc, n_time=512, n_freq=64))
s.receivers[0] = rx
a = run("adc512x64", s, rx)
# delta-resampled 40 kHz emission lands mid-band: interior freq bins carry
# the energy, the band-edge columns stay comparatively empty
prof64 = a[..., 0] if a.ndim == 3 else a
assert prof64[:, 16:48].sum() > prof64[:, :2].sum()

# 9) full range-Doppler-class grid (512x256 = 131072 cells): the cap-lift
# candidate — VMEM residency 4 accs x 512KB + tent tiles ~2.4 MB total
s, rx, _ = base_scene()
rx = dc.replace(rx, adc=dc.replace(rx.adc, n_time=512, n_freq=256))
s.receivers[0] = rx
run("adc512x256", s, rx)

# 10) MIMO per-element channels (BASELINE config 5 at kernel rate):
# 8-element lambda/2 ULA, one dot_general splats all 16 I/Q channels;
# DAS beamforming on the hardware cube recovers the target azimuth
from beifong_tpu.radar import phased_receiver
from beifong_tpu.radar.endpoints import rx_elem_offsets
from beifong_tpu.dsp import beamform as bf

az_true, R_m = 15.0, 4.0
band_m = Band.from_freq(340.0, 40e3, 1e3)
wl_m = band_m.wavelength_centre
s = sc.Scene(band=band_m)
s.add(diffuse("mat", reflectance=1.0, twosided=True))
wf_m = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=1e3,
             is_delta=True)
s.add(wigner_transmitter("tx", wf_m, resample_freq=True))
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([0.1, 0, 0], [0.1, -1, 0]),
               tf.scale([0.004, 0.004, 1.0]))), transmitter="tx"))
adc_m = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                  sampling_time=0.06, freq_lo=39.5e3, freq_hi=40.5e3)
rx_m = phased_receiver("rx", adc_m, n_elems=8, elem_spacing=wl_m / 2,
                       elem_wid=(wl_m / 4, wl_m / 4), receive_type='raw')
s.add(rx_m)
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([0.0, 0, 0], [0.0, -1, 0]),
               tf.scale([1e-4, 1e-4, 1.0]))), receiver="rx"))
tx_t = R_m * np.sin(np.radians(az_true))
ty_t = -R_m * np.cos(np.radians(az_true))
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([tx_t, ty_t, 0], [0, 0, 0]), tf.scale(0.2))),
    bsdf="mat"))
sd_m = s.compile()
why = []
assert supported(sd_m, rx_m, why, mimo=True), why
t0 = time.perf_counter()
sig_m, n_m = receive_pallas(s, sd_m, rx_m, spp=1 << 20, seed=3, max_depth=2,
                            time_sampling='gate', mimo=True)
jax.block_until_ready(sig_m)
dt = time.perf_counter() - t0
sig_m = np.asarray(sig_m)
assert sig_m.shape == (64, 1, 16) and np.isfinite(sig_m).all()
cube_m = np.moveaxis((sig_m[..., 0::2] + 1j * sig_m[..., 1::2])
                     * (64.0 / n_m), -1, 0)
offs_m = np.asarray(rx_elem_offsets(sd_m, rx_m,
                                    s.shape_index_of_endpoint('receiver',
                                                              rx_m.id)))
az_grid = np.radians(np.linspace(-40.0, 40.0, 81))
dirs_m = np.asarray(bf.ula_directions(az_grid, axis=(1, 0, 0),
                                      normal=(0, -1, 0)))
# DAS on host (numpy): the kernel under test is the receive, not the tiny
# beamform matmul (which the axon backend rejects for host-resident f64)
a_m = np.exp(2j * np.pi * 40e3 / 340.0 * (dirs_m @ offs_m.T))     # (A, E)
B_m = np.einsum('ae,etf->atf', np.conj(a_m), cube_m) / offs_m.shape[0]
p_m = (np.abs(B_m) ** 2).sum(axis=(1, 2))
pk_az = float(np.degrees(az_grid[p_m.argmax()]))
rate = n_m / dt
print(f"mimo8: compile+run {dt:.1f}s  DAS peak az {pk_az:.1f} "
      f"(expect ~{az_true})  {rate / 1e6:.1f}M samples/s incl compile",
      flush=True)
assert abs(pk_az - az_true) <= 2.0, pk_az

# 11) disk + cylinder analytic prims (round-4 intersectors)
s, rx, _ = base_scene()
s.add(sh.disk(to_world=np.asarray(
    tf.compose(tf.look_at([1.2, -3.8, 0], [0, 0, 0]), tf.scale(0.4))),
    bsdf="mat"))
s.add(sh.cylinder(to_world=np.asarray(
    tf.compose(tf.translate([-1.2, -5.0, -0.5]),
               tf.scale([0.3, 0.3, 1.0]))), bsdf="mat"))
run("disk+cylinder", s, rx)

# 12) smooth dielectric + thin dielectric windows (delta reflect/refract
# chains) in front of a trihedral corner — the echo is the DETERMINISTIC
# window-transmit -> 3-mirror retro -> window-transmit -> tx-hit chain
from beifong_tpu.bsdf import dielectric as _diel, thin_dielectric as _thin


def corner_window_scene(win_bsdf):
    band = Band.from_freq(340.0, 40e3, 10e3)
    s = sc.Scene(band=band)
    s.add(conductor("m", eta=0.2, k=3.0, twosided=True))
    wf = pulse(f_centre=40e3, prf=10.0, pulse_len=2e-3, f_ext=2e3,
               is_delta=True)
    s.add(wigner_transmitter("tx", wf, resample_freq=True))
    s.add(sh.rectangle(to_world=np.asarray(
        tf.compose(tf.look_at([0.0, 0, 0], [0.0, -1, 0]),
                   tf.scale([0.8, 0.8, 1.0]))), transmitter="tx"))
    adc = ADCConfig(n_time=64, n_freq=1, sampling_start=0.0,
                    sampling_time=0.06, freq_lo=35e3, freq_hi=45e3)
    rx = wigner_receiver("rx", adc, receive_type='raw')
    s.add(rx)
    rx_pos = np.array([0.0, -0.1, 0.0])
    apex = np.array([0.0, -4.0, 0.0])
    s.add(sh.rectangle(to_world=np.asarray(
        tf.compose(tf.look_at(rx_pos, apex),
                   tf.scale([0.02, 0.02, 1.0]))), receiver="rx"))
    for f in sh.trihedral(apex, rx_pos - apex, bsdf="m"):
        s.add(f)
    s.add(win_bsdf)
    s.add(sh.rectangle(to_world=np.asarray(
        tf.compose(tf.look_at([0.0, -2.0, 0], [0, 0, 0]), tf.scale(2.0))),
        bsdf="win"))
    return s, rx


s, rx = corner_window_scene(_thin("win", int_ior=1.5))
run("thin-dielectric-window", s, rx, max_depth=6)
s, rx = corner_window_scene(_diel("win", int_ior=1.33,
                                  specular_transmittance=1.0))
run("dielectric-window", s, rx, max_depth=6)

# 13) kernel-rate CPI: 64-pulse micro-Doppler train as ONE lax.scan over
# per-pulse packed tables — the Bessel-comb sidebands of an orbiting
# scatterer land on exact multiples of the rotation rate, at kernel rate
from beifong_tpu.core.transform import AnimatedTransform
from beifong_tpu.radar import cw as _cw
from beifong_tpu.integrators.pallas_receive import receive_cpi_pallas

fc_c = 40e3
lam_c = 340.0 / fc_c
n_pulses, prf_c = 64, 400.0
m_rot = 4
f_rot = prf_c * m_rot / n_pulses
a_mod = 3.0
r_orb = a_mod * lam_c / (4 * np.pi)
band_c = Band.from_freq(340.0, fc_c, 10e3)
s = sc.Scene(band=band_c)
s.add(diffuse("mat", reflectance=1.0, twosided=True))
s.add(wigner_transmitter("tx", _cw(f_centre=fc_c), resample_freq=True))
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([0.3, 0, 0], [0.3, -1, 0]),
               tf.scale([0.05, 0.05, 1.0]))), transmitter="tx"))
adc_c = ADCConfig(n_time=8, n_freq=1, sampling_start=0.0,
                  sampling_time=2e-3, freq_lo=fc_c - 2e3, freq_hi=fc_c + 2e3)
rx_c = wigner_receiver("rx", adc_c, receive_type="raw")
s.add(rx_c)
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([-0.3, 0, 0], [-0.3, -1, 0]),
               tf.scale([0.05, 0.05, 1.0]))), receiver="rx"))
tgt_c = sh.rectangle(bsdf="mat")
frames_c = []
for p in range(n_pulses + 1):
    t_p = p / prf_c
    psi = 2 * np.pi * f_rot * t_p
    pos = [r_orb * np.cos(psi), -(4.0 + r_orb * np.sin(psi)), 0.0]
    frames_c.append((t_p, np.asarray(
        tf.compose(tf.look_at(pos, [0.0, 0.0, 0.0]), tf.scale(0.3)))))
tgt_c.to_world = AnimatedTransform.from_keyframes(frames_c)
s.add(tgt_c)

spp_c = 1 << 20
t0 = time.perf_counter()
cube_c, n_c = receive_cpi_pallas(s, n_pulses=n_pulses, prf=prf_c, seed=11,
                                 spp=spp_c, max_depth=1,
                                 time_sampling='gate', coherent=True)
jax.block_until_ready(cube_c)
dt_compile = time.perf_counter() - t0
t0 = time.perf_counter()
cube_c, n_c = receive_cpi_pallas(s, n_pulses=n_pulses, prf=prf_c, seed=12,
                                 spp=spp_c, max_depth=1,
                                 time_sampling='gate', coherent=True)
jax.block_until_ready(cube_c)
dt_c = time.perf_counter() - t0
g_c = np.asarray(cube_c)
iq_c = (g_c[..., 0] + 1j * g_c[..., 1]).sum(axis=(1, 2)) / n_c
spec_c = np.abs(np.fft.fftshift(np.fft.fft(iq_c))) ** 2
comb = sorted({(n_pulses // 2 + m_rot * k) % n_pulses
               for k in range(-4, 5)})
top = set(int(b) for b in np.argsort(spec_c)[::-1][:len(comb)])
print(f"cpi-scan: compile {dt_compile:.1f}s, run {dt_c * 1e3:.0f} ms for "
      f"{n_pulses} pulses x {spp_c >> 20}M lanes "
      f"({n_pulses / dt_c:.0f} pulses/s, "
      f"{n_pulses * n_c / dt_c / 1e6:.0f} M samples/s)  comb "
      f"{'OK' if top == set(comb) else (sorted(top), comb)}", flush=True)
assert top == set(comb), (sorted(top), comb)

# 14) plastic + rough-plastic targets (two-lobe dielectric-coat models)
from beifong_tpu.bsdf import plastic as _pl, rough_plastic as _rpl
s, rx, _ = base_scene()
s.add(_pl("pl", diffuse_reflectance=0.8, int_ior=1.49, twosided=True))
s.add(_rpl("rpl", diffuse_reflectance=0.8, alpha=0.4, int_ior=1.49,
           twosided=True))
s.shapes[-1].bsdf = "pl"
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([1.3, -4.6, 0], [0, 0, 0]), tf.scale(0.45))),
    bsdf="rpl"))
run("plastic+roughplastic", s, rx)

# 15) rough dielectric target (GGX glass, round-5 chi+/pdf fixes)
from beifong_tpu.bsdf import rough_dielectric as _rd
s, rx, _ = base_scene()
s.add(_rd("rdl", alpha=0.4, int_ior=1.5))
s.shapes[-1].bsdf = "rdl"
run("rough-dielectric", s, rx)

# 16) blend + mask composites (second-lobe prim columns, per-lane pick,
# mask pass-through delta)
from beifong_tpu.bsdf import rough_conductor as _rc
from beifong_tpu.bsdf.tables import blend as _blend, mask as _mask
s, rx, _ = base_scene()
s.add(_rc("rcm", alpha=0.3, eta=0.2, k=3.0, twosided=True))
s.add(_blend("bl", "mat", "rcm", weight=0.6))
s.shapes[-1].bsdf = "bl"
s.add(_mask("mk", "mat", opacity=0.6))
s.add(sh.rectangle(to_world=np.asarray(
    tf.compose(tf.look_at([1.1, -4.4, 0], [0, 0, 0]), tf.scale(0.4))),
    bsdf="mk"))
run("blend+mask", s, rx)

# 17) 3-D gridded ambient medium (one-hot gather tau, 16-pt quadrature)
from beifong_tpu.media import HeterogeneousMedium as _HM
s, rx, _ = base_scene()
g3 = np.full((4, 4, 8), 0.03, np.float32)
g3[:, :2, :] = 0.08
s.medium = _HM.make(g3, box_min=(-20, -20, -20), box_max=(20, 20, 20))
run("grid3-medium", s, rx)

print("ALL TPU VARIANT CHECKS PASSED", flush=True)
