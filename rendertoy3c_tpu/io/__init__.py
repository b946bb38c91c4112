from .obj import load_obj, parse_mtl
