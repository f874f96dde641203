from .vecmath import (
    dot, cross, normalize, length, reflect, luminance,
    make_basis, concentric_sample_disk, cosine_sample_hemisphere,
)
from .rng import (
    wang_hash, pcg_hash, RaySampler,
)
from .image import (
    tonemap, write_ppm, write_png, read_ppm, rmse, srgb_to_linear,
)
