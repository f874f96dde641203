from .fresnel import (
    pow5, fresnel_schlick, fresnel_dielectric, fresnel_moment_1,
    fresnel_moment_2,
)
from .bsdf import (
    lambertian_sample, specular_glass_sample, ggx_reflection_sample,
    rough_glass_sample, microfacet_interface_sample, fresnel_blend_sample,
    henyey_greenstein_sample,
)
