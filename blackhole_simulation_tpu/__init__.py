"""blackhole_simulation_tpu — a TPU-native differentiable Kerr geodesic renderer.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
steeltroops-ai/blackhole-simulation (Rust/WASM/WebGL), re-derived as pure tensor
programs:

- ``geometry``  — metric tensors (Boyer-Lindquist + horizon-regular Kerr-Schild,
                  Schwarzschild, Minkowski), derived radii, Christoffel symbols.
                  (reference: physics-engine/gravitas-core/src/metric/, tensor/)
- ``geodesic``  — Hamiltonian null-geodesic integrators (adaptive RKF45, RK4,
                  symplectic implicit midpoint), null renormalization,
                  constants of motion. (reference: gravitas-core/src/geodesic/,
                  invariants/)
- ``physics``   — Page-Thorne disk flux/temperature, Cunningham redshift,
                  Bardeen shadow, Planck/CIE spectral LUTs, Hawking temperature.
                  (reference: gravitas-core/src/physics/, quantum/)
- ``spacetime`` — Kretschmann curvature, embeddings, frame dragging, light
                  cones. (reference: gravitas-core/src/spacetime/)
- ``render``    — camera model, batched ray march, disk/redshift shading,
                  supersampled accumulation. (reference: src/shaders/)
- ``ops``       — Pallas TPU kernels for the hot march loop.
- ``parallel``  — device mesh, ray/tile sharding, multi-host collectives.
- ``perf``      — performance monitor, benchmark controller, validator.
                  (reference: src/performance/)
- ``models``    — neural radiance surrogate (NRS) MLP.
                  (reference: physics-engine/_legacy_src/training.rs)
- ``engine``    — PhysicsEngine facade + native seqlock state bridge.
                  (reference: gravitas-wasm/src/lib.rs, src/engine/)

The f64 "oracle" layer (geometry/geodesic in float64 on CPU) is the ground truth
the f32 TPU fast path is validated against, mirroring the reference's
gravitas-core (f64 Rust) vs GPU-shader split.
"""

import jax

# The oracle layer requires float64. The fast TPU path is explicitly float32
# throughout (see render/, ops/) so enabling x64 does not affect it.
jax.config.update("jax_enable_x64", True)

from blackhole_simulation_tpu import constants  # noqa: E402,F401

__version__ = "0.1.0"
