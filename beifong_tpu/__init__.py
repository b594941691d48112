"""beifong_tpu — a TPU-native radar/sonar signal simulator and renderer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the beifong
(Mitsuba 2 radar fork) reference: physically-based light/signal transport where
transmitters carry waveforms, rays carry retarded time and phase, antennas are
modelled by Wigner distribution functions, and received fast-time signals feed
an all-XLA DSP chain (pulse compression, range-Doppler).
"""

__version__ = "0.1.0"

import jax as _jax

# On TPU the default matmul/einsum precision feeds the MXU with
# bfloat16-truncated inputs.  Every 4x4 transform compose, ray-to-object
# einsum, aperture-WDF projection and film splat in this package is
# f32-correctness-critical (observed: a lambda/4 target shift vanished
# because scale(0.3) quantized to 0.30078125 inside tf.compose on real
# hardware, silently breaking coherent phase).  Geometry and signal
# accuracy beat the MXU's bf16 speedup here; hot compute paths are Pallas
# kernels and elementwise VPU code, which this setting does not touch.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import core  # noqa: F401
from .core import Band, SimConfig, band_preset  # noqa: F401
