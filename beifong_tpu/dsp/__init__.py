from . import windows, fir, pulse, rangedoppler, resample, cfar, beamform  # noqa: F401
