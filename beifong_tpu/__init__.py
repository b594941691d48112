"""beifong_tpu — a TPU-native radar/sonar signal simulator and renderer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the beifong
(Mitsuba 2 radar fork) reference: physically-based light/signal transport where
transmitters carry waveforms, rays carry retarded time and phase, antennas are
modelled by Wigner distribution functions, and received fast-time signals feed
an all-XLA DSP chain (pulse compression, range-Doppler).
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
from .core import Band, SimConfig, band_preset  # noqa: F401
