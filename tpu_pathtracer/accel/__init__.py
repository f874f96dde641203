from .bvh import (
    Platform, BuildParams, BVHNode, SBVHBuilder, build_bvh, validate_bvh,
)
from .flatten import FlatBVH, flatten_bvh, flatten_mesh_bvh, woopify
from .cache import load_or_build
