"""Zero-padded FFT convolution engine with Fourier-analytic placement.

All convolutions in the numerical core run through the machinery here:

- exact LINEAR convolution of ``(m, m)`` fine-grid images with ``(m, m)``
  PSFs, via zero-padding to ``L = 2m`` (supports m + m - 1 <= 2m: no wrap),
- sub-pixel placement of point sources through Fourier phase ramps on the
  precomputed PSF transform (no image interpolation, ever), and
- the target-resolution Gaussian ``r`` applied as its ANALYTIC Fourier
  transform (a real Gaussian in k-space), so point sources are rendered at
  exact sub-pixel positions.

Alignment convention: a PSF array ``t`` (peak at array coordinate
``c = (m - 1) / 2``) convolved with a gridded image places a copy of ``t``
peak-centered on each source pixel.  This is achieved by folding the
constant phase ``exp(+2*pi*i k.c / L)`` into the PSF transform once
(``psf_fft_for_grid``), after which the output is read from the simple
corner crop ``[0:m, 0:m]`` of the inverse FFT.

This design makes one optimizer iteration of the joint deconvolution cost
one ``rfft2(h)`` (shared across epochs) plus one ``irfft2`` per epoch —
everything else is elementwise, which XLA fuses.
"""

import jax
import jax.numpy as jnp

from .conventions import fwhm_to_sigma, TARGET_FWHM_FINE_PIX


def _unit_phase(ang):
    """exp(i*ang) via lax.complex(cos, sin).

    Avoids complex ``exp`` — real cos/sin map directly onto the TPU VPU
    (and the experimental backend has shown transient compile failures on
    complex exponentials).
    """
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


def pad_len(m):
    """FFT length used for an (m, m) fine grid (exact linear convolution)."""
    return 2 * m


def freq_grids(m, dtype=jnp.float32, L=None):
    """Return (fy, fx) frequency grids (cycles / fine pixel) for rfft2 at L.

    fy has shape (L, 1); fx has shape (1, L // 2 + 1): they broadcast to the
    rfft2 output shape.  ``L`` defaults to :func:`pad_len` (= 2m, exact for
    arbitrary in-stamp placement); center-pinned fits (the PSF fit, where
    |shift| <= 3 data px by bound) may pass a reduced L — see
    ops/dft.make_irfft2_pool_mats and core/psf/build.build_psf(dft_pad=...).
    """
    L = pad_len(m) if L is None else int(L)
    fy = jnp.fft.fftfreq(L).astype(dtype).reshape(L, 1)
    fx = jnp.fft.rfftfreq(L).astype(dtype).reshape(1, L // 2 + 1)
    return fy, fx


def r_kernel_fft(m, s, dtype=jnp.float32, L=None):
    """Analytic rfft2 of the unit-integral target Gaussian ``r`` at the origin.

    ``r`` has FWHM = TARGET_FWHM_FINE_PIX fine pixels; its transform is the
    real Gaussian ``exp(-2 pi^2 sigma_f^2 |f|^2)`` (DC = 1, unit integral).
    ``s`` is accepted for signature symmetry (sigma is fixed in fine px).
    """
    del s
    sigma_f = fwhm_to_sigma(TARGET_FWHM_FINE_PIX)
    fy, fx = freq_grids(m, dtype=dtype, L=L)
    return jnp.exp(-2.0 * jnp.pi**2 * sigma_f**2 * (fy**2 + fx**2))


def r_kernel_fft_1d(m, s, dtype=jnp.float32, L=None):
    """The SEPARABLE 1-D factors of :func:`r_kernel_fft`.

    ``r_kernel_fft = ry[:, None] * rx[None, :]`` (a Gaussian factorizes
    over axes).  Folding these into 1-D phase ramps lets hot paths touch
    only the raw PSF spectrum per iteration (HBM-bound fits).
    """
    del s
    sigma_f = fwhm_to_sigma(TARGET_FWHM_FINE_PIX)
    L = pad_len(m) if L is None else int(L)
    fy = jnp.fft.fftfreq(L).astype(dtype)
    fx = jnp.fft.rfftfreq(L).astype(dtype)
    c = -2.0 * jnp.pi**2 * sigma_f**2
    return jnp.exp(c * fy**2), jnp.exp(c * fx**2)


def grid_center_phase_1d(m, dtype=jnp.float32):
    """1-D factors of :func:`grid_center_phase`.

    Returns ``(gy_re, gy_im, gx_re, gx_im)`` with
    ``grid_center_phase = (gy_re + i gy_im)[:, None] * (gx_re + i gx_im)``.
    """
    c = (m - 1) / 2.0
    L = pad_len(m)
    fy = jnp.fft.fftfreq(L).astype(dtype)
    fx = jnp.fft.rfftfreq(L).astype(dtype)
    ay = 2.0 * jnp.pi * fy * c
    ax = 2.0 * jnp.pi * fx * c
    return jnp.cos(ay), jnp.sin(ay), jnp.cos(ax), jnp.sin(ax)


def shift_phase(m, sx, sy, dtype=jnp.float32):
    """Phase ramp translating by (sx, sy) FINE pixels (real-valued shifts).

    Returns a complex array broadcastable against rfft2 output at L = 2m.
    sx/sy may be scalars or arrays with leading batch dims (appended dims
    are created here).
    """
    fy, fx = freq_grids(m, dtype=dtype)
    sx = jnp.asarray(sx, dtype=dtype)[..., None, None]
    sy = jnp.asarray(sy, dtype=dtype)[..., None, None]
    ang = -2.0 * jnp.pi * (fy * sy + fx * sx)
    return _unit_phase(ang)


def psf_fft(t, dtype=jnp.complex64):
    """rfft2 of a zero-padded PSF array ``t`` of shape (..., m, m)."""
    m = t.shape[-1]
    L = pad_len(m)
    return jnp.fft.rfft2(t, s=(L, L)).astype(dtype)


def grid_center_phase(m, dtype=jnp.float32):
    """Constant phase exp(+2 pi i k . c / L) with c = (m - 1) / 2.

    Folding this into a PSF transform re-centers the PSF array at index 0,
    so that convolution with a gridded image is peak-aligned and the output
    is the corner crop [0:m, 0:m].
    """
    c = (m - 1) / 2.0
    fy, fx = freq_grids(m, dtype=dtype)
    ang = 2.0 * jnp.pi * (fy + fx) * c
    return _unit_phase(ang)


def psf_fft_for_grid(t):
    """PSF transform ready for convolution with gridded images (see module doc)."""
    m = t.shape[-1]
    return psf_fft(t) * grid_center_phase(m)


def convolve_grid(img, t_hat_grid):
    """Linear 'same' convolution of gridded image(s) with a prepared PSF fft.

    Args:
        img: (..., m, m) fine-grid image.
        t_hat_grid: output of :func:`psf_fft_for_grid` (broadcastable).

    Returns:
        (..., m, m): each img pixel spawns a peak-aligned PSF copy.
    """
    m = img.shape[-1]
    L = pad_len(m)
    img_hat = jnp.fft.rfft2(img, s=(L, L))
    out = jnp.fft.irfft2(img_hat * t_hat_grid, s=(L, L))
    return out[..., :m, :m]


def render_from_fft(total_hat, m):
    """Inverse transform + corner crop for an assembled model spectrum."""
    L = pad_len(m)
    return jnp.fft.irfft2(total_hat, s=(L, L))[..., :m, :m]


def point_source_ramps(m, s, a, px, py, dtype=jnp.float32, ry=None,
                       rx=None, L=None):
    """1-D factors of the separable point-source phase ramps.

    The spectrum of ``a * r(. - p)`` relative to a PSF transform is the
    outer product ``u v^T`` with ``u = a exp(-2 pi i fy s py)`` (length
    L, full axis) and ``v = exp(-2 pi i fx s px)`` (length L//2+1, half
    axis).  Returns ``(u_re, u_im, v_re, v_im)`` with a trailing
    frequency axis appended to the shapes of ``a``/``px``/``py``; the
    amplitude is folded into ``u``.

    ``ry``/``rx`` (from :func:`r_kernel_fft_1d`) fold the separable
    target-Gaussian transform into the ramps, so callers can pair the
    ramps with the RAW PSF spectrum instead of a premultiplied one.

    These factors feed :func:`...ops.dft.irfft2_pool_shift_matmul`,
    which renders single-source models WITHOUT materializing the
    (..., L, L//2+1) spectrum.
    """
    L = pad_len(m) if L is None else int(L)
    fy = jnp.fft.fftfreq(L).astype(dtype)                  # (L,)
    fx = jnp.fft.rfftfreq(L).astype(dtype)                 # (L/2+1,)
    ay = -2.0 * jnp.pi * fy * (s * jnp.asarray(py, dtype=dtype))[..., None]
    ax = -2.0 * jnp.pi * fx * (s * jnp.asarray(px, dtype=dtype))[..., None]
    amps = jnp.asarray(a, dtype=dtype)[..., None]
    uy = amps if ry is None else amps * ry
    vx = jnp.ones((), dtype) if rx is None else rx
    return (uy * jnp.cos(ay), uy * jnp.sin(ay),
            vx * jnp.cos(ax), vx * jnp.sin(ax))


def point_source_ramp_stacks(m, s, a, px, py, dtype=jnp.float32, ry=None,
                             rx=None, L=None):
    """Stacked rank-1 factors of the point-source spectrum.

    Returns ``(u_re, u_im, v)`` with shapes (..., 2M, L), (..., 2M, L),
    (..., 2M, L//2+1) such that

        spec_re = sum_c u_re[c] (x) v[c]
        spec_im = sum_c u_im[c] (x) v[c]

    equals :func:`point_source_spectrum` (same stacking identity as its
    GEMM formulation).  ``ry``/``rx`` fold the separable target-Gaussian
    transform in (see :func:`point_source_ramps`).  Feeds
    :func:`point_source_spectrum_parts` and the fused Pallas renderer
    (ops/experimental/fused_render.py).
    """
    L = pad_len(m) if L is None else int(L)
    fy = jnp.fft.fftfreq(L).astype(dtype)
    fx = jnp.fft.rfftfreq(L).astype(dtype)
    ay = -2.0 * jnp.pi * fy * (s * jnp.asarray(py, dtype=dtype))[..., None]
    ax = -2.0 * jnp.pi * fx * (s * jnp.asarray(px, dtype=dtype))[..., None]
    cy, sy_ = jnp.cos(ay), jnp.sin(ay)                     # (..., M, L)
    cx, sx_ = jnp.cos(ax), jnp.sin(ax)                     # (..., M, Lh)
    amps = jnp.asarray(a, dtype=dtype)[..., None]
    uy = amps if ry is None else amps * ry
    u_re = jnp.concatenate([uy * cy, -uy * sy_], axis=-2)
    u_im = jnp.concatenate([uy * sy_, uy * cy], axis=-2)
    if rx is not None:
        cx, sx_ = rx * cx, rx * sx_
    v = jnp.concatenate([cx, sx_], axis=-2)
    return u_re, u_im, v


def point_source_spectrum_parts(m, s, a, px, py, dtype=jnp.float32,
                                ry=None, rx=None, L=None):
    """(re, im) of :func:`point_source_spectrum` as separate REAL arrays.

    The hot fits are HBM-bound; keeping the spectrum as an explicit
    (re, im) pair end-to-end avoids the complex-array assembly and the
    real()/imag() extraction copies of the complex path (measured on
    the 1000-epoch joint fit).  ``ry``/``rx`` optionally fold the
    separable r-kernel in (then multiply with the RAW PSF spectrum).
    """
    u_re, u_im, v = point_source_ramp_stacks(m, s, a, px, py, dtype=dtype,
                                             ry=ry, rx=rx, L=L)
    re = jnp.einsum("...jy,...jx->...yx", u_re, v,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=dtype)
    im = jnp.einsum("...jy,...jx->...yx", u_im, v,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=dtype)
    return re, im


def point_source_spectrum(m, s, a, px, py, dtype=jnp.float32, L=None):
    """Fourier spectrum of a sum of unit-'r' point sources, RELATIVE to a PSF.

    Multiplying the result with ``psf_fft(t) * r_kernel_fft(m, s)``'s... —
    more precisely with ``psf_fft(t)`` times :func:`r_kernel_fft` — yields
    the spectrum of ``sum_j a_j * (t * r)(. - p_j)`` where positions are in
    DATA pixels relative to the stamp center (the PSF's own array center
    cancels: only the relative shift ``s * p`` appears).

    Args:
        m: fine-grid side.
        s: subsampling factor.
        a: (..., M) amplitudes.
        px, py: (..., M) positions in data pixels (center-origin).

    Returns:
        complex array (..., L, L // 2 + 1).
    """
    # the phase is SEPARABLE: exp(-2πi(fy·sy + fx·sx)) =
    # exp(-2πi fy·sy) ⊗ exp(-2πi fx·sx).  Evaluating cos/sin on the two
    # 1-D factors costs O(L) transcendentals per source instead of
    # O(L²/2) on the broadcast grid (~40x fewer transcendentals at
    # L=256).  The source sum of outer products is then TWO batched
    # GEMMs with contraction 2M — MXU work with no (..., M, L, L/2+1)
    # intermediate ever materialized:
    #   re + i·im = Σ_j a_j (cy_j + i·sy_j)(cx_j + i·sx_j)
    #   re = [a·cy, -a·sy] @ [cx, sx]   (stacked along the j axis)
    #   im = [a·sy,  a·cy] @ [cx, sx]
    if jnp.asarray(a).shape[-1] == 1:
        # single source: plain outer product (the GEMM detour measurably
        # hurts the per-star PSF/photometry fits)
        L = pad_len(m) if L is None else int(L)
        fy = jnp.fft.fftfreq(L).astype(dtype)
        fx = jnp.fft.rfftfreq(L).astype(dtype)
        ay = -2.0 * jnp.pi * fy \
            * (s * jnp.asarray(py, dtype=dtype))[..., None]
        ax = -2.0 * jnp.pi * fx \
            * (s * jnp.asarray(px, dtype=dtype))[..., None]
        amps = jnp.asarray(a, dtype=dtype)[..., None]
        u_re = (amps * jnp.cos(ay))[..., 0, :, None]
        u_im = (amps * jnp.sin(ay))[..., 0, :, None]
        vx_c = jnp.cos(ax)[..., 0, None, :]
        vx_s = jnp.sin(ax)[..., 0, None, :]
        re = u_re * vx_c - u_im * vx_s
        im = u_re * vx_s + u_im * vx_c
        return jax.lax.complex(re, im)
    # one authoritative implementation of the sign-sensitive stacking:
    # the complex path is the all-real parts path plus an assembly
    return jax.lax.complex(
        *point_source_spectrum_parts(m, s, a, px, py, dtype=dtype, L=L))
