from .tables import (  # noqa: F401
    BSDFTable, BSDFSpec, diffuse, conductor, rough_conductor, dielectric,
    rough_dielectric, thin_dielectric, plastic, rough_plastic, null, mask,
    blend, normalmap, bumpmap,
    DIFFUSE, CONDUCTOR, ROUGH_CONDUCTOR, DIELECTRIC, THIN_DIELECTRIC,
    PLASTIC, ROUGH_PLASTIC, NULL, MASK, BLEND, ROUGH_DIELECTRIC,
)
from .eval import bsdf_eval_pdf, bsdf_sample  # noqa: F401
