"""rendertoy3c_tpu — a TPU-native wavefront Monte-Carlo path tracing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
CodingEric/rendertoy3C (a CUDA/OptiX interactive path tracer): progressive
unbiased path tracing with next-event estimation, Russian roulette, Lambertian
shading, texturing, two-level acceleration structures, and motion blur —
re-architected as a jit-compiled wavefront loop over SoA ray-state arrays,
sharded across TPU meshes with XLA collectives.

Layer map (TPU-native equivalents of the reference's stack):
  math/       sampling, ONB, RNG               <- src/util/, cuda/random.h
  film/       accumulation, tonemap, image IO  <- src/gui/display, sutil/sutil.cpp
  scene/      device scene pytree, lights, textures, camera
                                               <- src/cuda/cuda_scene.h, src/light.h
  accel/      LBVH build (BLAS/TLAS)           <- src/cuda/cuda_mesh.h, cuda_accel.h
  trace/      intersection + traversal kernels <- OptiX optixTraverse
  integrate/  wavefront path integrator        <- src/shader/*.cu
  parallel/   device-mesh sharding             <- sutil/WorkDistribution.h
  io/         OBJ/MTL loading                  <- src/mesh.cpp
  app/        CLI + viewer                     <- src/wavefront.cpp, sutil UI
"""

__version__ = "0.1.0"
