from . import windows, fir, pulse, rangedoppler, resample, cfar  # noqa: F401
