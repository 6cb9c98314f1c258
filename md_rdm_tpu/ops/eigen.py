"""Principal-eigenvector depth recovery (alternative to ALS).

Reference: computations.py:7-36 (``principal_eigen``) - for an error-laden
comparison matrix M (ideally rank-1, M[i,j] = d_i/d_j), the depth vector is
recovered as the eigenvector of the largest-magnitude eigenvalue, made
positive, and normalized by its geometric mean.

The reference loops over the batch calling dense ``torch.eig``.  Dense
nonsymmetric eigendecomposition does not exist on TPU; the dominant
eigenvector of these matrices (Perron-Frobenius: positive entries -> real
positive dominant eigenvalue, positive eigenvector) is obtained by batched
**power iteration** - pure matvecs on the MXU, jit/vmap-friendly.  For the
64x64 comparison matrices, |lambda_2/lambda_1| is tiny (near-rank-1), so a
fixed small iteration count converges far below float32 resolution.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def principal_eigen(m: jnp.ndarray, num_iters: int = 50) -> jnp.ndarray:
    """(B, n^2, n^2) positive comparison matrices -> (B, 1, n, n) maps.

    Power iteration for the dominant eigenvector, |.| + geometric-mean
    normalization per the reference.
    """
    b, s, _ = m.shape
    n = int(round(s ** 0.5))
    v = jnp.ones((b, s, 1), m.dtype) / jnp.sqrt(jnp.asarray(s, m.dtype))

    def body(_, v):
        w = jnp.matmul(m, v)
        return w / jnp.linalg.norm(w, axis=1, keepdims=True)

    v = jax.lax.fori_loop(0, num_iters, body, v)
    v = jnp.abs(v[:, :, 0])
    gm = jnp.exp(jnp.mean(jnp.log(v), axis=1, keepdims=True))
    return (v / gm).reshape(b, 1, n, n)


def dominant_eigenvalue(m: jnp.ndarray, num_iters: int = 50) -> jnp.ndarray:
    """Rayleigh-quotient estimate of the dominant eigenvalue per batch."""
    b, s, _ = m.shape
    v = jnp.ones((b, s, 1), m.dtype)

    def body(_, v):
        w = jnp.matmul(m, v)
        return w / jnp.linalg.norm(w, axis=1, keepdims=True)

    v = jax.lax.fori_loop(0, num_iters, body, v)
    mv = jnp.matmul(m, v)
    return jnp.sum(v * mv, axis=(1, 2)) / jnp.sum(v * v, axis=(1, 2))
