"""Coherent I/Q accumulation tests: phase-resolved receive mode."""

import numpy as np
import pytest
import jax.numpy as jnp

import __graft_entry__ as g
from beifong_tpu.receive import receive


def test_coherent_mode_accumulates_iq():
    s, rx = g._build_scene(ground=False, rx_kind="omni")
    sd = s.compile()
    adc, n = receive(s, sd, rx, seed=0, spp=1 << 14, max_depth=2,
                     coherent=True, time_sampling='gate')
    a = np.asarray(adc)
    assert a.shape[-1] == 4          # I, Q, weight, count
    iq = a[..., 0] + 1j * a[..., 1]
    assert np.abs(iq).sum() > 0
    # the envelope must peak where the power profile peaks
    adc_p, n2 = receive(s, sd, rx, seed=0, spp=1 << 14, max_depth=2,
                        coherent=False, time_sampling='gate')
    p = np.asarray(adc_p)[..., 0]
    assert abs(int(np.abs(iq)[:, 0].argmax()) - int(p[:, 0].argmax())) <= 2


def test_coherent_phase_stability():
    """Same geometry, same seed: phase is deterministic; moving the target a
    quarter wavelength flips the echo phase by ~pi."""
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
    for R in (4.0, 4.0 + lam / 4):   # quarter-wave -> half-wave round trip
        s, rx = build(R)
        sd = s.compile()
        adc, n = receive(s, sd, rx, seed=3, spp=1 << 14, max_depth=2,
                         coherent=True, time_sampling='gate')
        a = np.asarray(adc)
        iq = complex(a[..., 0].sum(), a[..., 1].sum())
        assert abs(iq) > 0
        phases.append(np.angle(iq))
    dphi = (phases[1] - phases[0]) % (2 * np.pi)
    # round-trip of lambda/4 extra range = half wavelength = pi phase flip
    assert dphi == pytest.approx(np.pi, abs=0.5), f"dphi={dphi}"
