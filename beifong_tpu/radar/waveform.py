"""Analytic waveforms evaluated through their Wigner time-frequency
distributions.

Replaces the waveform machinery embedded in the reference's transmitter
plugins (`src/transmitters/wignertransmitter.cpp:65-188`): signal types
cw / pulse / linfmcw with Wigner eval (`eval_signal`), instantaneous-frequency
delta sampling (`sample_delta_frequency`) and band-uniform sampling
(`sample_frequency`).  All parameters are device scalars (differentiable);
the vectorized closed forms dispatch by a per-row kind code.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.math import TwoPi, wchirp, rect as rect_fn

CW = 0
PULSE = 1
LINFMCW = 2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Waveform:
    """SoA waveform parameters; every field shape (n,) (or scalar).

    amplitude [V], rep_freq = PRF/CRF [Hz], t_ext = pulse/chirp length [s],
    f_centre [Hz], f_ext = sweep/bandwidth [Hz], phi0 [rad].
    """

    kind: jax.Array        # int32
    amplitude: jax.Array
    rep_freq: jax.Array
    t_ext: jax.Array
    f_centre: jax.Array
    f_ext: jax.Array
    phi0: jax.Array
    is_delta: jax.Array    # bool: sample frequency as a delta

    def _fold(self, time):
        """Fold absolute time into the pulse repetition interval; returns
        (t_in_pri, t_centre_offset)."""
        pri = 1.0 / jnp.maximum(self.rep_freq, 1e-12)
        t = jnp.mod(time, pri)
        ti = 0.5 * self.t_ext   # pulse centred at t_ext/2 in the PRI
        return t, ti

    def inst_freq(self, time):
        """Instantaneous frequency at absolute time (linfmcw ridge;
        f_centre otherwise) — reference `sample_delta_frequency`
        (`wignertransmitter.cpp:152-170`)."""
        t, ti = self._fold(time)
        fi_chirp = self.f_centre + (self.f_ext / jnp.maximum(self.t_ext, 1e-12)) * (t - ti)
        return jnp.where(self.kind == LINFMCW, fi_chirp, self.f_centre)

    def eval_wdf(self, time, freq):
        """Wigner distribution value W(t, f) in V^2/Hz (may be negative) —
        reference `eval_signal` (`wignertransmitter.cpp:111-146`)."""
        t, ti = self._fold(time)
        fi = self.inst_freq(time)
        in_pulse = rect_fn((t - ti) / jnp.maximum(self.t_ext, 1e-12)) > 0.0
        w_pulse = jnp.where(in_pulse,
                            wchirp(t - ti, freq - fi, self.t_ext, self.amplitude),
                            0.0)
        w_cw = self.amplitude * self.amplitude
        return jnp.where(self.kind == CW, w_cw, w_pulse)

    def phase(self, time):
        """Instantaneous carrier phase [rad] at absolute time (for coherent
        mixing).  The reference computes then zeroes this
        (`wignertransmitter.cpp:146`); we keep it."""
        t, ti = self._fold(time)
        slope = self.f_ext / jnp.maximum(self.t_ext, 1e-12)
        ph_chirp = self.phi0 + TwoPi * (t - ti) * (self.f_centre + 0.5 * slope * (t - ti))
        ph_tone = self.phi0 + TwoPi * t * self.f_centre
        return jnp.where(self.kind == LINFMCW, ph_chirp, ph_tone)

    def sample_frequency(self, time, u):
        """Draw an emission frequency at `time`.

        Delta waveforms return the instantaneous frequency with weight
        A^2 * ... folded into eval; non-delta draw uniformly over the band
        and weight by the WDF (reference `sample_frequency`,
        `wignertransmitter.cpp:174-188`).  Returns (freq, weight).
        """
        f_delta = self.inst_freq(time)
        f_uni = (u - 0.5) * self.f_ext + self.f_centre
        f = jnp.where(self.is_delta, f_delta, f_uni)
        w_delta = jnp.ones_like(f)
        w_uni = self.eval_wdf(time, f_uni)
        return f, jnp.where(self.is_delta, w_delta, w_uni)


def _b(v):
    return jnp.asarray(v, jnp.float32)


def cw(f_centre, amplitude=1.0, phi0=0.0, f_ext=0.0, is_delta=True) -> Waveform:
    return Waveform(kind=jnp.int32(CW), amplitude=_b(amplitude),
                    rep_freq=_b(1.0), t_ext=_b(1.0), f_centre=_b(f_centre),
                    f_ext=_b(f_ext), phi0=_b(phi0),
                    is_delta=jnp.asarray(is_delta))


def pulse(f_centre, prf, pulse_len, amplitude=1.0, f_ext=None, phi0=0.0,
          is_delta=False) -> Waveform:
    if f_ext is None:
        f_ext = 1.0 / pulse_len   # transform-limited
    return Waveform(kind=jnp.int32(PULSE), amplitude=_b(amplitude),
                    rep_freq=_b(prf), t_ext=_b(pulse_len), f_centre=_b(f_centre),
                    f_ext=_b(f_ext), phi0=_b(phi0), is_delta=jnp.asarray(is_delta))


def linfmcw(f_centre, crf, chirp_len, freq_sweep, amplitude=1.0, phi0=0.0,
            is_delta=True) -> Waveform:
    return Waveform(kind=jnp.int32(LINFMCW), amplitude=_b(amplitude),
                    rep_freq=_b(crf), t_ext=_b(chirp_len), f_centre=_b(f_centre),
                    f_ext=_b(freq_sweep), phi0=_b(phi0),
                    is_delta=jnp.asarray(is_delta))


def stack(waveforms: list[Waveform]) -> Waveform:
    """Stack per-transmitter waveforms into one SoA Waveform of shape (n,)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *waveforms)
