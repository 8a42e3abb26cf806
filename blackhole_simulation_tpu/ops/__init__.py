"""Fast TPU kernels for the hot march loop.

``ks_kernel``: the sparse scalar-component Kerr-Schild geodesic kernel — no
(...,4,4) tensors anywhere (4x4 matrices pad to (8,128) TPU tiles at ~3%
utilization and thrash HBM); every quantity is a flat (...,) lane array and
the Hamiltonian derivatives are hand-derived closed forms (the analytic-
expansion strategy of the reference, gravitas-core kerr.rs:442-499, applied
to our exact ingoing-KS Hamiltonian).

``pallas_march``: the Pallas TPU kernel marching tiles of rays fully
in-VMEM (see pallas_march.py).
"""

from blackhole_simulation_tpu.ops.ks_kernel import (
    ks_hamiltonian,
    ks_renormalize,
    ks_rhs,
    ks_symplectic_step,
)

__all__ = [
    "ks_hamiltonian",
    "ks_renormalize",
    "ks_rhs",
    "ks_symplectic_step",
]
