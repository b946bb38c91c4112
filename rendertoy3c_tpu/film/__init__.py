from .tonemap import aces_tonemap, to_srgb, quantize_u8, make_color
from .film import Film, film_create, film_accumulate, film_reset
from .image import write_png, write_ppm, write_exr, read_ppm
