from .morton import morton3d, morton3d_np
from .lbvh import BVH8, build_bvh8, reorder_scene_by_bvh, ENC_EMPTY
