"""rendertoy3c_tpu — a TPU-native wavefront Monte-Carlo path tracing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
CodingEric/rendertoy3C (a CUDA/OptiX interactive path tracer): progressive
unbiased path tracing with next-event estimation, Russian roulette, Lambertian
shading, texturing, two-level acceleration structures, and motion blur —
re-architected as a jit-compiled wavefront loop over SoA ray-state arrays,
sharded across TPU meshes with XLA collectives.

Layer map (TPU-native equivalents of the reference's stack):
  math/       sampling, ONB, RNG, microfacets, curves, matrices
                                               <- src/util/, cuda/random.h,
                                                  cuda/curve.h, sutil math
  film/       accumulation, tonemap, image IO, denoiser
                                               <- src/gui/display, sutil/sutil.cpp
  scene/      device scene pytree, lights, textures, env maps, camera,
              instanced scenes (two-level AS)  <- src/cuda/cuda_scene.h,
                                                  src/light.h, cuda_accel.h
  accel/      LBVH build + Morton ordering     <- src/cuda/cuda_mesh.h
  trace/      Pallas intersection kernels (dense MT + tile cull, motion,
              instanced, fused shade), jnp tracers, analytic primitives
                                               <- OptiX optixTraverse + programs
  integrate/  wave + persistent-pool path integrators, BSDF dispatch,
              GGX direct lighting              <- src/shader/*.cu, cuda/whitted.cu
  parallel/   device-mesh sharding             <- sutil/WorkDistribution.h
  io/         OBJ/MTL + GLTF loading           <- src/mesh.cpp, sutil/Scene.cpp
  app/        CLI + viewer                     <- src/wavefront.cpp, sutil UI
  utils/      checkpoint, timers, profiling, debug, warmup
  native/     ctypes bindings to the C++ host runtime (native/*.cc)

See PARITY.md for the line-by-line reference inventory mapping and
BENCH_DETAILS.json for measured performance across the BASELINE workloads.
"""

__version__ = "0.1.0"
