from .vec import (
    dot, cross, normalize, length, luminance, faceforward, reflect, lerp,
)
from .rng import tea, lcg, rnd, rnd2, rot_seed
from .onb import Onb, onb_from_normal, onb_local_to_world
from .sampling import (
    sample_cosine_hemisphere,
    cosine_hemisphere_pdf,
    sample_uniform_disk_concentric,
    sample_uniform_triangle,
    power_heuristic,
)
