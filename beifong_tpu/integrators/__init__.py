from .path import path_sample  # noqa: F401
