from .config import (
    SceneDesc, MatDesc, load_scene_desc, materials_to_arrays,
    MAT_EMIT, MAT_DIFF, MAT_GLASS, MAT_REFL, MAT_DIFF_REFL, MAT_FRESNEL,
    MAT_NULL, MAT_SUBSURFACE, MEDIUM_PRESETS, F0_PRESETS,
)
from .mesh import TriangleMesh, fill_missing_normals, compute_face_normals
from .objloader import load_obj, write_obj
from .plyloader import load_ply, write_ply_binary
from .hdr import read_hdr, write_hdr
from .camera import RenderCamera, InteractiveCamera
from .texture import load_texture, sample_texture, sample_envmap
from . import procedural
