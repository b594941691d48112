from . import config, distr, math, rng, spectrum, transform, warp  # noqa: F401
from .config import Band, SimConfig, band_preset  # noqa: F401
