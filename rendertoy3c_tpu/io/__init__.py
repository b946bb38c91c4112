from .obj import load_obj, parse_mtl
from .gltf import load_gltf, PointLight
