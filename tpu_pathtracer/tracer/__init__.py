from .traverse import intersect_scene, woop_geometric_normal, brute_force_intersect
from .wavefront import RenderSettings, make_integrator
from .renderer import Renderer, renderer_from_scene_desc, generate_camera_rays
