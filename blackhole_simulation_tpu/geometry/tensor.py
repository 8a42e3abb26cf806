"""Batched 4x4 metric-tensor algebra.

Capability parity with reference gravitas-core/src/tensor/metric_tensor.rs:18-99
(contract / raise_index / determinant) and tensor/christoffel.rs:17-78 —
but TPU-native: tensors are ``(..., 4, 4)`` jnp arrays batched over leading
axes, and Christoffel symbols come from exact forward-mode autodiff of the
metric (``jax.jacfwd``) instead of central finite differences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def contract(g: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray | None = None) -> jnp.ndarray:
    """g^{mu nu} p_mu q_nu (or p twice). g: (...,4,4), p/q: (...,4)."""
    if q is None:
        q = p
    return jnp.einsum("...ij,...i,...j->...", g, p, q)


def raise_index(g_inv: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """p^mu = g^{mu nu} p_nu. g_inv: (...,4,4), p: (...,4)."""
    return jnp.einsum("...ij,...j->...i", g_inv, p)


def lower_index(g: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """v_mu = g_{mu nu} v^nu."""
    return jnp.einsum("...ij,...j->...i", g, v)


def determinant(g: jnp.ndarray) -> jnp.ndarray:
    """det of a batched 4x4 tensor (XLA-lowered, replaces hand-written minors)."""
    return jnp.linalg.det(g)


def christoffel(metric, r: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Christoffel symbols Gamma^alpha_{mu nu} at (r, theta), shape (...,4,4,4).

    For stationary axisymmetric metrics only d/dr and d/dtheta are nonzero
    (t, phi are Killing directions), mirroring the reference's optimization
    (tensor/christoffel.rs:17-78) — but with *exact* jacfwd derivatives.
    """
    def cov(rt):
        return metric.covariant(rt[0], rt[1])

    rt = jnp.stack([jnp.asarray(r), jnp.asarray(theta)], axis=-1)

    def gamma_at(rt_single):
        g = cov(rt_single)                       # (4,4)
        dg_drt = jax.jacfwd(cov)(rt_single)      # (4,4,2): d g_{ij} / d(r,theta)
        # Full derivative tensor d_k g_{ij}, k in {t,r,theta,phi}
        zeros = jnp.zeros_like(g)
        dg = jnp.stack([zeros, dg_drt[..., 0], dg_drt[..., 1], zeros], axis=0)
        g_inv = jnp.linalg.inv(g)
        # Gamma^a_{mn} = 1/2 g^{ab} (d_m g_{bn} + d_n g_{bm} - d_b g_{mn})
        term = (
            jnp.einsum("mbn->bmn", dg)
            + jnp.einsum("nbm->bmn", dg)
            - jnp.einsum("bmn->bmn", dg)
        )
        return 0.5 * jnp.einsum("ab,bmn->amn", g_inv, term)

    flat = rt.reshape(-1, 2)
    gammas = jax.vmap(gamma_at)(flat)
    return gammas.reshape(rt.shape[:-1] + (4, 4, 4))
