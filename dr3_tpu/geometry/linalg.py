"""Small-matrix linear algebra helpers tuned for batching on TPU.

The reference leans on OpenCV SVD for every DLT solve (reference
src/two.cpp:88,114,143,252, src/utils.cpp:82, src/initialization.cpp:160-168).
On TPU we want *batched* solves with static shapes; for the "smallest right
singular vector of A" pattern (null space of a DLT system) we use the
symmetric eigendecomposition of the small Gram matrix A^T A — A is 2Nx9 /
2Nx9 / 4x4, so the Gram matrix is at most 9x9 and `eigh` batches cleanly
under vmap (a single fused XLA kernel instead of N sequential SVDs).
"""

from __future__ import annotations

import jax.numpy as jnp


def smallest_eigvec_gram(A: jnp.ndarray) -> jnp.ndarray:
    """Right-singular vector of A [..., m, n] for its smallest singular value.

    Computed as the eigenvector of A^T A for the smallest eigenvalue. `eigh`
    returns ascending eigenvalues, so column 0 is the null direction.
    """
    G = jnp.einsum("...ji,...jk->...ik", A, A)
    _, vecs = jnp.linalg.eigh(G)
    return vecs[..., :, 0]


def solve_psd(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Solve (A + damping I) x = b for symmetric PSD A via Cholesky."""
    n = A.shape[-1]
    if damping:
        A = A + damping * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    y = jnp.linalg.solve(L, b[..., None] if b.ndim == A.ndim - 1 else b)
    x = jnp.linalg.solve(jnp.swapaxes(L, -1, -2), y)
    return x[..., 0] if b.ndim == A.ndim - 1 else x


def inv3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / det) — no LU dispatch."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-20, jnp.sign(det) * 1e-20 + 1e-20, det)
    adj = jnp.stack([
        A, -(b * i - c * h), b * f - c * e,
        B, a * i - c * g, -(a * f - c * d),
        C, -(a * h - b * g), a * e - b * d,
    ], axis=-1).reshape(m.shape)
    return adj / det[..., None, None]
