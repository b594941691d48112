from . import bitmap  # noqa: F401
from .bitmap import write_exr, read_exr, write_pfm, read_pfm, write_png  # noqa: F401
