"""Inverse DFT as MXU matmuls: faster than this backend's FFT.

The joint-deconvolution iteration is dominated by per-epoch inverse real
FFTs.  On this TPU the XLA FFT runs at ~0.3 TFLOP/s-equivalent; the same
transform expressed as two real matmul pairs maps onto the MXU and — with
the crop to the (m, m) model region folded INTO the matmul shapes — does
4x less arithmetic than a full-length transform on top of the higher
unit throughput.  Measured: 1.5x over jnp.fft.irfft2 at full precision
before cropping, more after.

All matrices are built once per problem and travel through ``consts``
(see core/optimize.py module docstring for the no-closure-constants
rule).

    out[y, x] = Re sum_{k, j} X[k, j] w[j] e^{2 pi i k y / L}
                                          e^{2 pi i j x / L} / L^2

with w the Hermitian doubling weights of the half spectrum.
"""

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _crop_mats_np(L, m):
    """float64 numpy irfft2-crop matrices (shared builder)."""
    Lh = L // 2 + 1
    k = np.arange(L)
    y = np.arange(m)
    Ay = np.cos(2 * np.pi * np.outer(y, k) / L) / L
    By = np.sin(2 * np.pi * np.outer(y, k) / L) / L
    j = np.arange(Lh)
    x = np.arange(m)
    w = np.ones(Lh)
    if L % 2 == 0:
        w[1:-1] = 2.0  # every non-DC, non-Nyquist bin appears twice
    else:
        w[1:] = 2.0    # odd L: no unique Nyquist bin — all non-DC double
    Cx = (np.cos(2 * np.pi * np.outer(j, x) / L) * w[:, None]) / L
    Sx = (np.sin(2 * np.pi * np.outer(j, x) / L) * w[:, None]) / L
    return Ay, By, Cx, Sx


def make_irfft2_crop_mats(L, m, dtype=np.float32):
    """Matrices for irfft2 at length L cropped to the leading (m, m).

    Returns dict of arrays: Ay, By (m, L) — inverse transform along the
    full-spectrum axis, rows cropped; Cx, Sx (L//2+1, m) — along the
    half-spectrum axis with Hermitian doubling, columns cropped.
    """
    Ay, By, Cx, Sx = _crop_mats_np(L, m)
    return {"Ay": jnp.asarray(Ay, dtype), "By": jnp.asarray(By, dtype),
            "Cx": jnp.asarray(Cx, dtype), "Sx": jnp.asarray(Sx, dtype),
            # [Ay; By] stacked: stage 1 reads each spectrum part ONCE
            # (two einsums instead of four — the fit is HBM-bound and
            # XLA does not merge same-RHS dots here)
            "ABy": jnp.asarray(np.concatenate([Ay, By], axis=0), dtype)}


def make_irfft2_pool_mats(L, m, s, dtype=np.float32):
    """irfft2-at-L, crop to (m, m), THEN s x s sum-pool — as matrices.

    The flux-conserving downsample is linear, so it folds into the
    transform matrices: rows of Ay/By pooled in groups of s, columns of
    Cx/Sx likewise.  The matmul output lands directly on the (m/s, m/s)
    DATA grid — the (m, m) fine image is never materialized and both
    contraction stages shrink by s (the hot fit is HBM-bound, measured).
    """
    assert m % s == 0
    n = m // s
    Ay, By, Cx, Sx = _crop_mats_np(L, m)  # float64 before pooling
    ayp = Ay.reshape(n, s, L).sum(axis=1)
    byp = By.reshape(n, s, L).sum(axis=1)
    return {"Ayp": jnp.asarray(ayp, dtype),
            "Byp": jnp.asarray(byp, dtype),
            "Cxp": jnp.asarray(
                Cx.reshape(L // 2 + 1, n, s).sum(axis=2), dtype),
            "Sxp": jnp.asarray(
                Sx.reshape(L // 2 + 1, n, s).sum(axis=2), dtype),
            # stacked stage-1 matrix (see make_irfft2_crop_mats)
            "AByp": jnp.asarray(np.concatenate([ayp, byp], axis=0),
                                dtype)}


def irfft2_pool_matmul(total_hat, mats, precision=None):
    """downsample(irfft2(total_hat)[..., :m, :m], s) via pooled matmuls.

    Same k-first contraction order as :func:`irfft2_crop_matmul`, with
    the sum-pool folded into the matrices (:func:`make_irfft2_pool_mats`).
    Returns the (..., m/s, m/s) DATA-grid render.
    """
    return irfft2_pool_matmul_parts(jnp.real(total_hat),
                                    jnp.imag(total_hat), mats, precision)


def irfft2_pool_matmul_parts(Xr, Xi, mats, precision=None):
    """:func:`irfft2_pool_matmul` on an explicit (re, im) spectrum pair.

    Callers that already hold the spectrum as separate real arrays (the
    all-real hot path of core/deconv/model.py) skip the complex
    assembly + real()/imag() extraction copies entirely.
    """
    precision = _precision(precision)
    n = mats["Ayp"].shape[0]
    if "AByp" in mats:
        # stacked stage 1: each of Xr/Xi streams through HBM once
        P = jnp.einsum("yk,...kj->...yj", mats["AByp"], Xr,
                       precision=precision)
        Q = jnp.einsum("yk,...kj->...yj", mats["AByp"], Xi,
                       precision=precision)
        A = P[..., :n, :] - Q[..., n:, :]
        B = Q[..., :n, :] + P[..., n:, :]
    else:
        A = jnp.einsum("yk,...kj->...yj", mats["Ayp"], Xr,
                       precision=precision) \
            - jnp.einsum("yk,...kj->...yj", mats["Byp"], Xi,
                         precision=precision)
        B = jnp.einsum("yk,...kj->...yj", mats["Ayp"], Xi,
                       precision=precision) \
            + jnp.einsum("yk,...kj->...yj", mats["Byp"], Xr,
                         precision=precision)
    return jnp.einsum("...yj,jx->...yx", A, mats["Cxp"],
                      precision=precision) \
        - jnp.einsum("...yj,jx->...yx", B, mats["Sxp"],
                     precision=precision)


def irfft2_pool_shift_matmul(S_re, S_im, u_re, u_im, v_re, v_im, mats,
                             precision=None, batched_spectrum=False):
    """Render shifted copies of ONE spectrum directly on the data grid.

    Computes, per batch element ``i`` (e.g. a star),

        out_i = Re{ (Ayp + i Byp) diag(u_i) (S_re + i S_im)
                                  diag(v_i) (Cxp + i Sxp) }

    i.e. ``downsample(irfft2(u_i v_i^T * S)[..., :m, :m], s)`` — the
    sum-pooled render of the SHARED spectrum ``S`` (a PSF transform)
    shifted by the separable phase ramp ``u_i v_i^T`` (from
    :func:`...core.convolution.point_source_ramps`, amplitude folded
    into ``u``).

    The (..., L, L//2+1) per-element spectrum of the plain
    ``irfft2_pool_matmul`` path is never materialized: the rank-1 ramp
    modulates the (n, L) inverse matrices instead (bytes: N*n*L vs
    N*L*(L/2+1) — 2x fewer at L = 2m = 4n, and no elementwise
    write+read of the big product).  Same FLOPs, measured faster on the
    HBM-bound PSF fit.

    Args:
        S_re, S_im: (L, L//2+1) shared spectrum; with
            ``batched_spectrum=True``, (..., L, L//2+1) with the SAME
            batch dims as the ramps (e.g. a per-epoch PSF spectrum).
        u_re, u_im: (..., L) full-axis ramp times amplitude.
        v_re, v_im: (..., L//2+1) half-axis ramp.
        mats: pooled matrices from :func:`make_irfft2_pool_mats`.

    Returns:
        (..., m/s, m/s) real render on the data grid.
    """
    precision = _precision(precision)
    stage1 = "...yk,...kj->...yj" if batched_spectrum \
        else "...yk,kj->...yj"
    # row-modulated inverse matrices, (..., n, L)
    R1 = mats["Ayp"] * u_re[..., None, :] - mats["Byp"] * u_im[..., None, :]
    I1 = mats["Ayp"] * u_im[..., None, :] + mats["Byp"] * u_re[..., None, :]
    # stage 1: contract the full-length axis against the shared spectrum
    Tr = jnp.einsum(stage1, R1, S_re, precision=precision) \
        - jnp.einsum(stage1, I1, S_im, precision=precision)
    Ti = jnp.einsum(stage1, R1, S_im, precision=precision) \
        + jnp.einsum(stage1, I1, S_re, precision=precision)
    # column ramp (elementwise, fuses into stage 2's operands)
    U = Tr * v_re[..., None, :] - Ti * v_im[..., None, :]
    V = Tr * v_im[..., None, :] + Ti * v_re[..., None, :]
    return jnp.einsum("...yj,jx->...yx", U, mats["Cxp"],
                      precision=precision) \
        - jnp.einsum("...yj,jx->...yx", V, mats["Sxp"],
                     precision=precision)


def make_rfft2_pad_mats(L, m, dtype=np.float32):
    """Matrices for rfft2 of an (m, m) image zero-padded to (L, L).

    The zero padding is folded into the matrix shapes: only the m
    occupied rows/columns are touched.
    """
    Lh = L // 2 + 1
    k = np.arange(L)
    y = np.arange(m)
    Cy = np.cos(2 * np.pi * np.outer(k, y) / L)
    Sy = np.sin(2 * np.pi * np.outer(k, y) / L)
    j = np.arange(Lh)
    x = np.arange(m)
    Cx = np.cos(2 * np.pi * np.outer(x, j) / L)
    Sx = np.sin(2 * np.pi * np.outer(x, j) / L)
    return {"fCy": jnp.asarray(Cy, dtype), "fSy": jnp.asarray(Sy, dtype),
            "fCx": jnp.asarray(Cx, dtype), "fSx": jnp.asarray(Sx, dtype)}


def precision_from_name(name):
    """Map a get_dft_precision() name to a lax Precision.

    Standalone jitted programs must key their cache on the precision
    NAME (a static argument) and convert with this helper, never read
    the ops global inside their trace — a flipped set_dft_precision()
    would otherwise silently reuse the old-precision program (the
    batched fitters thread the name the same way)."""
    if name is None:
        return None
    if name == "highest":
        return _HI
    if name == "high":
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.DEFAULT


def _precision(precision):
    if precision is not None:
        return precision
    from . import get_dft_precision

    return precision_from_name(get_dft_precision())


def rfft2_pad_matmul(img, mats, precision=None):
    """jnp.fft.rfft2(img, s=(L, L)) for (..., m, m) input, via matmuls.

    X = (Cy - i Sy) @ img @ (Cx - i Sx):
    real = Cy img Cx - Sy img Sx; imag = -(Cy img Sx + Sy img Cx).

    The HALF-spectrum x axis is contracted FIRST: the intermediates are
    (..., m, L//2+1) instead of (..., L, m) — half the bytes — and the
    first contraction runs m x m instead of L x m — half the stage-1
    FLOPs (same reasoning as the k-first inverse, see
    irfft2_crop_matmul).
    """
    re, im = rfft2_pad_matmul_parts(img, mats, precision)
    return jax.lax.complex(re, im)


def rfft2_pad_matmul_parts(img, mats, precision=None):
    """:func:`rfft2_pad_matmul` returning the explicit (re, im) pair."""
    precision = _precision(precision)
    U = jnp.einsum("...yx,xj->...yj", img, mats["fCx"],
                   precision=precision)
    V = jnp.einsum("...yx,xj->...yj", img, mats["fSx"],
                   precision=precision)
    re = jnp.einsum("ky,...yj->...kj", mats["fCy"], U,
                    precision=precision) \
        - jnp.einsum("ky,...yj->...kj", mats["fSy"], V,
                     precision=precision)
    im = -(jnp.einsum("ky,...yj->...kj", mats["fCy"], V,
                      precision=precision)
           + jnp.einsum("ky,...yj->...kj", mats["fSy"], U,
                        precision=precision))
    return re, im


def make_dft_mats(L, m, dtype=np.float32, pool=None):
    """Combined forward (rfft2-pad) + inverse (irfft2-crop) matrices.

    With ``pool=s`` the pooled inverse matrices
    (:func:`make_irfft2_pool_mats`) are included too, enabling the
    direct fine-spectrum -> data-grid render in model evaluation.
    """
    mats = {**make_irfft2_crop_mats(L, m, dtype),
            **make_rfft2_pad_mats(L, m, dtype)}
    if pool is not None and m % int(pool) == 0:
        mats.update(make_irfft2_pool_mats(L, m, int(pool), dtype))
    return mats


def irfft2_crop_matmul(total_hat, mats, precision=None):
    """Re(inverse rfft2)(total_hat)[..., :m, :m] via matmul pairs.

    out = Re{ (Ay + i By) @ X @ (Cx + i Sx) }.  The FULL-length k axis
    (L) is contracted FIRST: the intermediates are then (..., m, Lh)
    instead of (..., L, m) — half the bytes streamed through HBM — and
    the second contraction runs over Lh instead of L — half the
    stage-2 FLOPs.  Measured on the v5e (round 2): the 1000-epoch
    deconvolution step is HBM-bound, so the byte saving is wall time.

    Args:
        total_hat: (..., L, L//2+1) complex spectrum.
        mats: from :func:`make_irfft2_crop_mats`.

    Returns:
        (..., m, m) real array, equal to
        jnp.fft.irfft2(total_hat, s=(L, L))[..., :m, :m].
    """
    precision = _precision(precision)
    Xr = jnp.real(total_hat)
    Xi = jnp.imag(total_hat)
    m = mats["Ay"].shape[0]
    # A + iB = (Ay + i By) @ X, contracting k (length L)
    if "ABy" in mats:
        # stacked stage 1: each of Xr/Xi streams through HBM once
        P = jnp.einsum("yk,...kj->...yj", mats["ABy"], Xr,
                       precision=precision)
        Q = jnp.einsum("yk,...kj->...yj", mats["ABy"], Xi,
                       precision=precision)
        A = P[..., :m, :] - Q[..., m:, :]
        B = Q[..., :m, :] + P[..., m:, :]
    else:
        A = jnp.einsum("yk,...kj->...yj", mats["Ay"], Xr,
                       precision=precision) \
            - jnp.einsum("yk,...kj->...yj", mats["By"], Xi,
                         precision=precision)
        B = jnp.einsum("yk,...kj->...yj", mats["Ay"], Xi,
                       precision=precision) \
            + jnp.einsum("yk,...kj->...yj", mats["By"], Xr,
                         precision=precision)
    # Re{ (A + iB) @ (Cx + i Sx) }, contracting j (length L//2+1)
    return jnp.einsum("...yj,jx->...yx", A, mats["Cx"],
                      precision=precision) \
        - jnp.einsum("...yj,jx->...yx", B, mats["Sx"],
                     precision=precision)
