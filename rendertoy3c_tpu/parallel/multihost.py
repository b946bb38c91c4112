"""Multi-host (DCN) rendering: jax.distributed over the (tile, spp) mesh.

The reference's multi-device story stops at single-process multi-GPU tile
interleaving (sutil/WorkDistribution.h:34-91) with pinned-host / NVLink
output transport (sutil/CUDAOutputBuffer.h:45-51). The TPU-native
generalization (SURVEY.md S2.6) is JAX multi-controller SPMD: every host
runs the same program, `jax.distributed.initialize` wires the coordination
service, and the SAME (tile, spp) mesh from parallel/dist.py simply spans
all hosts' devices — XLA partitions the jitted subframe step and emits the
spp-axis `pmean` / counter `psum` collectives over ICI within a slice and
DCN across slices. No transport layer is hand-written; the only
multi-host-specific pieces are:

  * process-spanning array CREATION (a host can only materialize its
    addressable shards, so the sharded film builds via
    jax.make_array_from_callback instead of device_put), and
  * film ASSEMBLY for display/save (tile shards live on different hosts;
    `assemble_film` allgathers them to every process over DCN — the
    analog of the reference's ZERO_COPY readback path).

Scene/BVH tables stay replicated: each process loads the same scene
host-side and closes the jitted step over it, exactly like the
single-host path (deterministic builds make every host's copy identical).

Tested by tests/test_multihost.py: two CPU processes x 4 virtual devices
on one machine (gloo collectives) must produce the single-process image
bit-for-bit.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..film.film import Film
from ..integrate.config import RenderConfig


def init_multihost(coordinator: str, num_processes: int,
                   process_id: int) -> None:
    """Join the multi-controller job (jax.distributed.initialize).

    Must run before any backend use. coordinator is "host:port" of
    process 0; every process passes the same address.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def film_create_multihost(cfg: RenderConfig, mesh: Mesh) -> Film:
    """Sharded film whose tile shards span hosts.

    jax.device_put cannot build a non-fully-addressable array, so shards
    materialize per-process via make_array_from_callback (each host
    creates only the rows it owns).
    """
    sharding = NamedSharding(mesh, P("tile", None, None))
    shape = (cfg.height, cfg.width, 3)

    def img():
        return jax.make_array_from_callback(
            shape, sharding,
            lambda idx: np.zeros(shape, np.float32)[idx])

    subframe = jax.make_array_from_callback(
        (), NamedSharding(mesh, P()), lambda idx: np.zeros((), np.int32))
    return Film(accum=img(), subframe_index=subframe,
                albedo=img() if cfg.aov else None,
                normal=img() if cfg.aov else None)


def assemble_film(accum: jax.Array) -> np.ndarray:
    """Gather a tile-sharded film to a host numpy image on EVERY process
    (DCN allgather; the reference's multi-GPU readback analog)."""
    from jax.experimental import multihost_utils

    if accum.is_fully_addressable:
        return np.asarray(accum)
    return np.asarray(
        multihost_utils.process_allgather(accum, tiled=True))


def make_render_fn_multihost(
    scene,
    cfg: RenderConfig,
    n_spp: int = 1,
    tracer_kind: str = "auto",
) -> tuple[Callable, Mesh, object]:
    """Multi-host distributed subframe step over ALL processes' devices.

    Returns (step, mesh, film): the same jitted (cam, film) -> (film,
    stats) contract as parallel.dist.make_render_fn_dist, with the mesh
    spanning every host (tile axis = global device count // n_spp). Every
    process must call this with identical arguments (single-program
    multiple-controller), then drive the step in lockstep.
    """
    from .dist import make_mesh, make_render_fn_dist, prepare_tracer_factory

    mesh = make_mesh(n_spp=n_spp, devices=jax.devices())
    scene, factory = prepare_tracer_factory(scene, cfg, kind=tracer_kind)
    step, mesh = make_render_fn_dist(scene, cfg, mesh,
                                     tracer_factory=factory)
    film = film_create_multihost(cfg, mesh)
    return step, mesh, film
