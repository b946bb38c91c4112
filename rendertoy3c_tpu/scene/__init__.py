from .material import Material, MaterialType, MaterialTable
from .camera import Camera, CameraParams, Trackball
from .texture import TextureAtlas, build_texture_atlas, sample_texture_bilinear
from .light import LightTable, build_light_table
from .mesh import Mesh
from .scene import Scene, GeometrySoA, Instance, build_scene
