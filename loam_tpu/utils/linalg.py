"""Small batched linear algebra for the solvers.

Replaces the reference's OpenCV calls (SURVEY.md §2 native dep #3):
cv::solve(DECOMP_QR) on 6x6 / 5x3 systems and cv::eigen on 6x6 / 3x3
symmetric matrices (src/laserOdometry.cpp:765-775,
src/laserMapping.cpp:767,832,922-932).  Everything here is tiny and
batch-friendly: closed-form 3x3 eigensolving vectorizes over thousands of
map correspondences per GN iteration; the 6x6 work happens once per solve.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_sym6(ata, atb):
    """Solve the 6x6 normal equations AtA x = Atb.

    The reference uses cv::solve(DECOMP_QR) (src/laserOdometry.cpp:768,
    src/laserMapping.cpp:925).  AtA is symmetric PSD; on near-singular
    systems the result may be garbage/NaN — exactly as in the reference,
    where the degeneracy projector and the NaN guard clean it up.
    """
    return jnp.linalg.solve(ata, atb)


def degeneracy_projector(ata, eigen_threshold):
    """The eigenvalue degeneracy guard (src/laserOdometry.cpp:770-797,
    src/laserMapping.cpp:927-954).

    cv::eigen returns descending eigenvalues with eigenvectors as rows; the
    reference zeroes the rows of eigenvectors whose eigenvalue is below the
    threshold (scanning from the smallest up, breaking at the first good
    one) and forms P = V^-1 @ V2.  With orthonormal V that collapses to the
    spectral projector onto the span of the retained eigenvectors:

        P = sum_k [lambda_k >= thr] v_k v_k^T

    Returns (P, is_degenerate).
    """
    w, v = jnp.linalg.eigh(ata)  # ascending, eigenvectors as columns
    keep = (w >= eigen_threshold).astype(ata.dtype)
    P = (v * keep[None, :]) @ v.T
    return P, jnp.any(w < eigen_threshold)


def eigh3x3(A):
    """Closed-form symmetric 3x3 eigendecomposition, batched.

    Returns (w, V): eigenvalues descending (w[..., 0] largest, matching
    cv::eigen's convention at src/laserMapping.cpp:767-769) and unit
    eigenvectors as rows V[..., k, :] (cv::eigen stores eigenvectors as
    rows; the line fit reads matV1.at(0, *)).

    Uses the trigonometric solution of the characteristic polynomial
    (Smith 1961) and cross-product eigenvectors — fully vectorized, no
    iteration, ideal for the VPU.
    """
    dtype = A.dtype
    a00 = A[..., 0, 0]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a11 = A[..., 1, 1]
    a12 = A[..., 1, 2]
    a22 = A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (
        b00 * b00
        + b11 * b11
        + b22 * b22
        + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    # det(B)/2 with B = (A - qI)/p
    c00 = b11 * b22 - a12 * a12
    c01 = a01 * b22 - a12 * a02
    c02 = a01 * a12 - b11 * a02
    detb = b00 * c00 - a01 * c01 + a02 * c02
    r = detb / (2.0 * p * p * p)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    w = jnp.stack([e1, e2, e3], -1)  # descending

    eye = jnp.eye(3, dtype=dtype)

    def eigvec(lam_other1, lam_other2):
        # columns of (A - l1 I)(A - l2 I) span the remaining eigenspace
        M = (A - lam_other1[..., None, None] * eye) @ (
            A - lam_other2[..., None, None] * eye
        )
        norms = jnp.sum(M * M, axis=-2)
        best = jnp.argmax(norms, axis=-1)
        vcol = jnp.take_along_axis(M, best[..., None, None], axis=-1)[..., 0]
        return vcol / jnp.sqrt(
            jnp.maximum(jnp.sum(vcol * vcol, -1, keepdims=True), 1e-30)
        )

    v1 = eigvec(e2, e3)
    v3 = eigvec(e1, e2)
    v2 = jnp.cross(v3, v1)
    v2 = v2 / jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2, -1, keepdims=True), 1e-30))
    V = jnp.stack([v1, v2, v3], -2)
    return w, V


def fit_plane5(pts):
    """Least-squares plane through k points: solve A x = -1 (the
    5x3 QR solve at src/laserMapping.cpp:826-843), normalize to unit
    normal.  pts: (..., k, 3).  Returns (normal, d) with
    normal . p + d ~= 0 and |normal| = 1.

    Solved via batched modified Gram-Schmidt QR of the k x 3 system —
    error scales with cond(A) like the reference's cv::DECOMP_QR, not
    cond(A)^2: the normal-equation/adjugate route loses ~5 deg of normal
    accuracy in f32 on the near-coplanar clusters this is always called
    on.
    """
    A = pts
    b = -jnp.ones(pts.shape[:-1], pts.dtype)
    eps = jnp.asarray(1e-30, pts.dtype)

    a1 = A[..., :, 0]
    a2 = A[..., :, 1]
    a3 = A[..., :, 2]

    def norm(v):
        return jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1), eps))

    def dot(u, v):
        return jnp.sum(u * v, -1)

    r11 = norm(a1)
    q1 = a1 / r11[..., None]
    r12 = dot(q1, a2)
    a2p = a2 - r12[..., None] * q1
    r22 = norm(a2p)
    q2 = a2p / r22[..., None]
    r13 = dot(q1, a3)
    a3p = a3 - r13[..., None] * q1
    r23 = dot(q2, a3p)
    a3p = a3p - r23[..., None] * q2
    r33 = norm(a3p)
    q3 = a3p / r33[..., None]

    y1 = dot(q1, b)
    y2 = dot(q2, b)
    y3 = dot(q3, b)
    x3 = y3 / r33
    x2 = (y2 - r23 * x3) / r22
    x1 = (y1 - r12 * x2 - r13 * x3) / r11
    x = jnp.stack([x1, x2, x3], -1)

    ps = jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True), eps))
    normal = x / ps
    d = 1.0 / ps[..., 0]
    return normal, d


def solve3x3(M, b):
    """Batched 3x3 linear solve via the adjugate (Cramer)."""
    m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    m10, m11, m12 = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    m20, m21, m22 = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    c00 = m11 * m22 - m12 * m21
    c01 = m12 * m20 - m10 * m22
    c02 = m10 * m21 - m11 * m20
    det = m00 * c00 + m01 * c01 + m02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    c10 = m02 * m21 - m01 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m01 * m20 - m00 * m21
    c20 = m01 * m12 - m02 * m11
    c21 = m02 * m10 - m00 * m12
    c22 = m00 * m11 - m01 * m10
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], -1),
            jnp.stack([c01, c11, c21], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        -2,
    )
    return jnp.einsum("...ij,...j->...i", adj, b) * inv_det[..., None]
