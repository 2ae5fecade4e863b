"""pbrt_tpu — a TPU-native differentiable path tracer with pbrt-v3's capabilities.

Built from scratch as batched wavefront JAX + Pallas array programs (NOT a port
of pbrt's recursive C++ design).  The blueprint distilled from the reference is
in SURVEY.md at the repo root; reference citations in docstrings are
`file:line` into /root/reference (mmp/pbrt-v3).

Layer map (mirrors SURVEY.md §1, re-expressed TPU-first):
  core/        L0+L1: vecmath, transforms, RNG, spectrum, sampling, low-discrepancy
  shapes/      device-side intersection math (triangle watertight, quadrics)
  accel/       host-side BVH build -> flattened LinearBVHNode SoA arrays
  ops/         Pallas TPU kernels for the hot path (BVH traversal, intersect)
  samplers/    Sobol / Halton / stratified / random... as pure index->float fns
  filters/     closed-form reconstruction filters
  cameras/     batched ray generation
  lights/      light table + sampling kernels
  materials/   material table -> BSDF lobe parameter structs
  textures/    procedural + image textures, mipmaps
  media/       participating media
  integrators/ wavefront render loops (path, directlighting, ao, ...)
  sceneio/     .pbrt tokenizer/parser + graphics-state machine -> SceneArrays
  parallel/    mesh/sharding policy, film psum, multi-host utilities
  utils/       imageio, stats, config
"""

__version__ = "0.1.0"
