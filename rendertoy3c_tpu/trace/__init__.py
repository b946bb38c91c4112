from .intersect import (
    Hit,
    ray_triangle,
    trace_closest_bruteforce,
    trace_any_bruteforce,
    make_bruteforce_tracer,
)
