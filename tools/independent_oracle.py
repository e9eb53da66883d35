"""Independent cross-implementation oracle: torch + scipy, float64.

STARRED (the reference's numerical core, called at reference
processes/psf_modelling.py:164 and star_photometry.py:66-122) cannot be
installed in this hermetic environment, so the head-to-head golden
(tests/test_reference_golden.py / tools/record_reference_golden.py)
stays unrecorded.  This module is the strongest available substitute: a
SECOND, framework-independent implementation of the same documented
model equations —

    data_e  ~=  down( conv(t_e, r(. - p_e)) * a_e ) + mean_e     (photometry)
    stamp_i ~=  a_i * down( conv(t, r(. - (x0_i, y0_i))) )       (PSF fit)
    t = normalize(Moffat(fwhm_x, fwhm_y, beta) + g)

(core/conventions.py, core/deconv/model.py and core/psf/model.py module
docstrings; ultimately the reference's model semantics at
processes/roi_modelling.py:207-211) — built on entirely different
machinery:

    - torch.fft / torch autograd (not jax),
    - float64 end-to-end (the core is float32),
    - scipy's Fortran L-BFGS-B driver (the SAME optimizer library the
      reference's STARRED stack calls for its analytic phases) instead
      of the core's jit-compiled scan L-BFGS / AdaBelief.

Shared with the core are only the *conventions* that define the model
contract: center-origin data-pixel coordinates, flux-conserving s x s
sum-pooling, linear convolution at L = 2m, and the analytic-spectrum
target Gaussian r of FWHM 2 fine pixels (DC = 1).  Two implementations
of that spec agreeing to sub-mmag on the committed golden inputs is the
cross-check tests/test_independent_oracle.py pins each round.
"""

import math

import numpy as np
import torch

TARGET_FWHM_FINE_PIX = 2.0
_FWHM_OVER_SIGMA = 2.0 * math.sqrt(2.0 * math.log(2.0))

torch.set_default_dtype(torch.float64)


# --------------------------------------------------------------------
# model building blocks (torch, float64)
# --------------------------------------------------------------------

def _freqs(L):
    fy = torch.fft.fftfreq(L, dtype=torch.float64)[:, None]
    fx = torch.fft.rfftfreq(L, dtype=torch.float64)[None, :]
    return fy, fx


def _r_hat(L):
    """Analytic rfft2 spectrum of the unit-integral target Gaussian r."""
    sigma_f = TARGET_FWHM_FINE_PIX / _FWHM_OVER_SIGMA
    fy, fx = _freqs(L)
    return torch.exp(-2.0 * math.pi ** 2 * sigma_f ** 2
                     * (fy ** 2 + fx ** 2)).to(torch.complex128)


def _shift_phase(L, sx_fine, sy_fine):
    """Phase ramp translating by (sx, sy) FINE pixels; batched over leading
    dims of sx/sy."""
    fy, fx = _freqs(L)
    ang = -2.0 * math.pi * (fy * sy_fine[..., None, None]
                            + fx * sx_fine[..., None, None])
    return torch.exp(1j * ang)


def _pad_center(psf, m):
    """Center-pad (N, mp, mp) to (N, m, m) — same-parity grids, integer
    offset (core/deconv/model.py::pad_psf_to contract)."""
    mp = psf.shape[-1]
    if mp == m:
        return psf
    if mp > m:
        lo = (mp - m) // 2
        return psf[..., lo:lo + m, lo:lo + m]
    off = (m - mp) // 2
    out = torch.zeros(psf.shape[:-2] + (m, m), dtype=psf.dtype)
    out[..., off:off + mp, off:off + mp] = psf
    return out


def _downsample(fine, s):
    """Flux-conserving sum-pool by integer factor s."""
    if s == 1:
        return fine
    lead = fine.shape[:-2]
    my, mx = fine.shape[-2:]
    return fine.reshape(*lead, my // s, s, mx // s, s).sum(dim=(-3, -1))


def _render(psf_hat, r_hat, a, px, py, m, s):
    """down(conv(t, r)(. - p)) * a for a stack of epochs/stars.

    psf_hat: (N, L, L//2+1) rfft2 of the center-padded, unit-sum PSFs.
    a, px, py: (N,) flux and position (data pixels, center-origin).
    """
    L = 2 * m
    spec = psf_hat * r_hat * _shift_phase(L, s * px, s * py) \
        * a[..., None, None].to(torch.complex128)
    fine = torch.fft.irfft2(spec, s=(L, L))[..., :m, :m]
    return _downsample(fine, s)


def _moffat_fine(m, s, fwhm_x, fwhm_y, beta):
    """Unit-integral elliptical Moffat on the fine grid (phi = 0)."""
    c = (m - 1) / 2.0
    idx = (torch.arange(m, dtype=torch.float64) - c) / s
    y, x = torch.meshgrid(idx, idx, indexing="ij")
    root = torch.sqrt(2.0 ** (1.0 / beta) - 1.0)
    alpha_x = fwhm_x / (2.0 * root)
    alpha_y = fwhm_y / (2.0 * root)
    u = (x / alpha_x) ** 2 + (y / alpha_y) ** 2
    norm = (beta - 1.0) / (math.pi * alpha_x * alpha_y * s ** 2)
    return norm * (1.0 + u) ** (-beta)


def _scipy_lbfgsb(loss_fn, x0, bounds, maxiter=2000):
    """Drive scipy's Fortran L-BFGS-B with torch autograd gradients."""
    from scipy.optimize import minimize

    def f(x):
        xt = torch.tensor(x, dtype=torch.float64, requires_grad=True)
        val = loss_fn(xt)
        (grad,) = torch.autograd.grad(val, xt)
        return float(val.detach()), np.asarray(grad, dtype=np.float64)

    res = minimize(f, np.asarray(x0, dtype=np.float64), jac=True,
                   method="L-BFGS-B", bounds=bounds,
                   options={"maxiter": maxiter, "ftol": 1e-15,
                            "gtol": 1e-12, "maxcor": 30})
    return res


# --------------------------------------------------------------------
# joint PSF photometry (the sub-mmag headline quantity)
# --------------------------------------------------------------------

def fit_photometry(data, noisemap, psf, s, maxiter=4000):
    """Independent joint fit of one star: N epochs, one point source.

    Free parameters (matching the core's star fit,
    core/deconv/batched._prepare_one_star: mean and h fixed at 0,
    alpha 0): a (N), c_x, c_y (shared), dx, dy (N); positions bounded
    to +-5 data pixels.

    Returns dict with 'fluxes' (N,) in data units and 'chi2_per_frame'
    (N,) = sum(res^2 / sigma^2) / n^2 (the core's definition,
    core/deconv/batched.py; ultimately reference
    star_photometry.py:127).
    """
    data = torch.as_tensor(np.asarray(data, np.float64))
    sigma = torch.as_tensor(np.asarray(noisemap, np.float64))
    psf = torch.as_tensor(np.asarray(psf, np.float64))
    n_epochs, n_pix = data.shape[0], data.shape[-1]
    m = n_pix * s
    L = 2 * m

    psf = _pad_center(psf, m)
    psf = psf / psf.sum(dim=(-2, -1), keepdim=True)
    psf_hat = torch.fft.rfft2(psf, s=(L, L))
    r_hat = _r_hat(L)
    sigma_2 = sigma ** 2

    # flux init: stamp sum minus border-median background (same spec)
    borders = torch.stack([
        data[:, :1, :].reshape(n_epochs, -1).median(dim=1).values,
        data[:, :, :1].reshape(n_epochs, -1).median(dim=1).values,
        data[:, -1:, :].reshape(n_epochs, -1).median(dim=1).values,
        data[:, :, -1:].reshape(n_epochs, -1).median(dim=1).values,
    ]).mean(dim=0)
    a0 = data.sum(dim=(1, 2)) - n_pix ** 2 * borders

    # parameter vector: [a(N), c_x, c_y, dx(N), dy(N)]
    x0 = np.concatenate([np.asarray(a0), [0.0, 0.0],
                         np.zeros(2 * n_epochs)])
    bounds = ([(None, None)] * n_epochs
              + [(-5.0, 5.0)] * (2 + 2 * n_epochs))

    def unpack(x):
        a = x[:n_epochs]
        c_x, c_y = x[n_epochs], x[n_epochs + 1]
        dx = x[n_epochs + 2:2 * n_epochs + 2]
        dy = x[2 * n_epochs + 2:]
        return a, c_x + dx, c_y + dy

    def loss(x):
        a, px, py = unpack(x)
        model = _render(psf_hat, r_hat, a, px, py, m, s)
        return (((data - model) ** 2) / sigma_2).sum()

    res = _scipy_lbfgsb(loss, x0, bounds, maxiter=maxiter)
    a, px, py = unpack(torch.as_tensor(res.x))
    model = _render(psf_hat, r_hat, a, px, py, m, s)
    chi2_per_frame = (((data - model) ** 2) / sigma_2).sum(dim=(1, 2)) \
        / n_pix ** 2
    return {
        "fluxes": np.asarray(a.detach()),
        "chi2_per_frame": np.asarray(chi2_per_frame.detach()),
        "scipy_result": res,
    }


def render_photometry_model(psf, s, a, c_x, c_y, dx, dy, mean=None):
    """Forward model only (for render cross-checks against the core)."""
    psf = torch.as_tensor(np.asarray(psf, np.float64))
    n_epochs, n_pix = psf.shape[0], None
    a = torch.as_tensor(np.asarray(a, np.float64))
    px = torch.as_tensor(np.asarray(c_x, np.float64)) \
        + torch.as_tensor(np.asarray(dx, np.float64))
    py = torch.as_tensor(np.asarray(c_y, np.float64)) \
        + torch.as_tensor(np.asarray(dy, np.float64))
    mp = psf.shape[-1]
    m = mp  # PSF already on the fine grid of the data stamp
    psf = psf / psf.sum(dim=(-2, -1), keepdim=True)
    L = 2 * m
    psf_hat = torch.fft.rfft2(psf, s=(L, L))
    out = _render(psf_hat, _r_hat(L), a, px, py, m, s)
    if mean is not None:
        out = out + torch.as_tensor(
            np.asarray(mean, np.float64))[:, None, None]
    return np.asarray(out)


# --------------------------------------------------------------------
# narrow-PSF Moffat phase (build_psf phase 1)
# --------------------------------------------------------------------

def fit_moffat(image, noisemap, s, maxiter=2000, fwhm0=3.0):
    """Independent analytic-Moffat fit of a star stack.

    Same loss spec as the core's phase 1 (core/psf/build._phase_losses):
    per-star chi2 over unmasked pixels / count, summed and scaled by
    n_pix^2 / 2, plus the star-0 position pin at 1e-3; same bounds
    (core/psf/build.psf_bound_values) and inits; data scaled by its max.

    Returns fwhm_x, fwhm_y, beta and the analytic-phase reduced chi2.
    """
    image = np.asarray(image, np.float64)
    noisemap = np.asarray(noisemap, np.float64)
    n_stars, n_pix = image.shape[0], image.shape[-1]
    m = n_pix * s
    L = 2 * m

    masks = torch.as_tensor(np.isfinite(image))
    scale = float(np.nanmax(image))
    data = torch.as_tensor(np.nan_to_num(image / scale))
    sig2 = torch.as_tensor(
        np.where(np.isfinite(image),
                 np.nan_to_num(noisemap / scale, nan=1e8) ** 2, 1.0))
    good = masks.sum(dim=(-2, -1)).to(torch.float64)

    r_hat = _r_hat(L)
    a0 = np.clip(np.nansum(image / scale, axis=(1, 2)), 1e-3, None)
    fwhm0 = float(np.clip(fwhm0, 1.2, 0.45 * n_pix))

    # [fwhm_x, fwhm_y, beta, a(N), x0(N), y0(N)]
    x0 = np.concatenate([[fwhm0, fwhm0, 2.5], a0,
                         np.zeros(2 * n_stars)])
    bounds = ([(0.8, 0.9 * n_pix)] * 2 + [(1.15, 10.0)]
              + [(0.0, None)] * n_stars + [(-3.0, 3.0)] * 2 * n_stars)

    def loss(x):
        fwhm_x, fwhm_y, beta = x[0], x[1], x[2]
        a = x[3:3 + n_stars]
        sx = x[3 + n_stars:3 + 2 * n_stars]
        sy = x[3 + 2 * n_stars:]
        t = _moffat_fine(m, s, fwhm_x, fwhm_y, beta)
        t = t / t.sum()
        t_hat = torch.fft.rfft2(t, s=(L, L))
        model = _render(t_hat[None], r_hat, a, sx, sy, m, s)
        res2 = ((data - model) ** 2) / sig2
        res2 = torch.where(masks, res2, torch.zeros(()))
        chi2 = res2.sum(dim=(-2, -1)) / torch.clamp(good, min=1.0)
        pin = 0.5 * ((sx[0] / 1e-3) ** 2 + (sy[0] / 1e-3) ** 2)
        return 0.5 * chi2.sum() * n_pix ** 2 + pin

    res = _scipy_lbfgsb(loss, x0, bounds, maxiter=maxiter)
    x = res.x
    # reduced chi2 at the optimum (per-star mean over unmasked pixels)
    xt = torch.as_tensor(x)
    with torch.no_grad():
        val = loss(xt)
        fwhm_x, fwhm_y, beta = x[0], x[1], x[2]
        a = xt[3:3 + n_stars]
        sx = xt[3 + n_stars:3 + 2 * n_stars]
        sy = xt[3 + 2 * n_stars:]
        t = _moffat_fine(m, s, torch.as_tensor(fwhm_x),
                         torch.as_tensor(fwhm_y), torch.as_tensor(beta))
        t = t / t.sum()
        t_hat = torch.fft.rfft2(t, s=(L, L))
        model = _render(t_hat[None], r_hat, a, sx, sy, m, s)
        res2 = ((data - model) ** 2) / sig2
        res2 = torch.where(masks, res2, torch.zeros(()))
        chi2_stars = res2.sum(dim=(-2, -1)) / torch.clamp(good, min=1.0)
    return {
        "fwhm_x": float(fwhm_x),
        "fwhm_y": float(fwhm_y),
        "beta": float(beta),
        "chi2": float(chi2_stars.mean()),
        "loss": float(val),
        "scipy_result": res,
    }


# --------------------------------------------------------------------
# joint ROI deconvolution (multi-source + shared starlet-regularized
# background) — the headline workload
# --------------------------------------------------------------------

def _grid_center_phase(L, m):
    """exp(+2 pi i (fy + fx) c), c = (m - 1) / 2 — re-centers a PSF
    array at index 0 so conv with a gridded image is peak-aligned."""
    fy, fx = _freqs(L)
    c = (m - 1) / 2.0
    return torch.exp(2j * math.pi * ((fy + fx) * c))


def _starlet(img, n_scales):
    """A-trous starlet, B3 kernel [1,4,6,4,1]/16, mirror boundary
    (edge-repeating, numpy 'symmetric'); detail finest-first, coarse
    last — the documented core/starlet.py contract."""
    w = (1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16)

    def smooth_axis(x, d, axis):
        x = x.movedim(axis, -1)
        p = 2 * d
        xp = torch.cat([x[..., :p].flip(-1), x, x[..., -p:].flip(-1)],
                       dim=-1)
        n = x.shape[-1]
        out = sum(w[k] * xp[..., k * d:k * d + n] for k in range(5))
        return out.movedim(-1, axis)

    coeffs, cur = [], img
    for j in range(n_scales):
        sm = smooth_axis(smooth_axis(cur, 2 ** j, -1), 2 ** j, -2)
        coeffs.append(cur - sm)
        cur = sm
    coeffs.append(cur)
    return torch.stack(coeffs)


class RoiProblem:
    """The joint-deconvolution objective, assembled in torch.

    Mirrors the documented loss (core/deconv/loss.py module docstring):
    0.5 * chi2 + starlet-l1 on h (hf strength on the finest scale,
    'scales' on the middle ones, coarse free) + positivity on h and a.
    """

    def __init__(self, data, sigma_2, psf, s, lambda_scales=1.0,
                 lambda_hf=1.0, lambda_pos=100.0, W=None,
                 lambda_pts=0.0, pts_weights=None, lambda_flux_uni=0.0):
        data = torch.as_tensor(np.asarray(data, np.float64))
        self.data = data
        self.sigma_2 = torch.as_tensor(np.asarray(sigma_2, np.float64))
        self.n_epochs, self.n_pix = data.shape[0], data.shape[-1]
        self.s = s
        self.m = self.n_pix * s
        self.L = 2 * self.m
        psf = torch.as_tensor(np.asarray(psf, np.float64))
        psf = _pad_center(psf, self.m)
        psf = psf / psf.sum(dim=(-2, -1), keepdim=True)
        self.psf_hat = torch.fft.rfft2(psf, s=(self.L, self.L))
        self.r_hat = _r_hat(self.L)
        self.grid_phase = _grid_center_phase(self.L, self.m)
        self.n_scales = int(math.log2(self.m))
        self.lambda_scales = lambda_scales
        self.lambda_hf = lambda_hf
        self.lambda_pos = lambda_pos
        self.W = (torch.as_tensor(np.asarray(W, np.float64))
                  if W is not None
                  else torch.ones(self.n_scales + 1, self.m, self.m))
        self.lambda_pts = lambda_pts
        self.pts_weights = (torch.as_tensor(
            np.asarray(pts_weights, np.float64))
            if pts_weights is not None else None)
        self.lambda_flux_uni = lambda_flux_uni

    def render(self, kw):
        """Forward model (N, n, n) from a kwargs-like dict of tensors."""
        N = self.n_epochs
        ka = kw["kwargs_analytic"]
        M = ka["c_x"].shape[0]
        a = ka["a"].reshape(N, M)
        th = torch.deg2rad(ka["alpha"])[:, None]
        px = torch.cos(th) * ka["c_x"] - torch.sin(th) * ka["c_y"] \
            + ka["dx"][:, None]
        py = torch.sin(th) * ka["c_x"] + torch.cos(th) * ka["c_y"] \
            + ka["dy"][:, None]
        # sum of per-source phase ramps (N, L, L//2+1)
        ramps = _shift_phase(self.L, self.s * px, self.s * py)
        spec = (ramps * a[..., None, None].to(torch.complex128)).sum(dim=1)
        total = spec * self.psf_hat * self.r_hat
        h = kw["kwargs_background"]["h"].reshape(self.m, self.m)
        h_hat = torch.fft.rfft2(h, s=(self.L, self.L))
        total = total + h_hat * self.psf_hat * self.grid_phase
        fine = torch.fft.irfft2(total, s=(self.L, self.L))[
            ..., :self.m, :self.m]
        out = _downsample(fine, self.s)
        return out + kw["kwargs_background"]["mean"][:, None, None]

    def loss(self, kw):
        res = (self.data - self.render(kw)) ** 2 / self.sigma_2
        total = 0.5 * res.sum()
        h = kw["kwargs_background"]["h"].reshape(self.m, self.m)
        coeffs = _starlet(h, self.n_scales)
        wabs = self.W * coeffs.abs()
        total = total + self.lambda_hf * wabs[0].sum() \
            + self.lambda_scales * wabs[1:-1].sum()
        if self.lambda_pos:
            a = kw["kwargs_analytic"]["a"]
            total = total + self.lambda_pos * (
                torch.clamp(-h, min=0.0).sum()
                + torch.clamp(-a, min=0.0).sum())
        if self.lambda_pts and self.pts_weights is not None:
            total = total + self.lambda_pts * (
                self.pts_weights * h.abs()).sum()
        if self.lambda_flux_uni:
            M = kw["kwargs_analytic"]["c_x"].shape[0]
            a = kw["kwargs_analytic"]["a"].reshape(self.n_epochs, M)
            mean = a.mean(dim=0)
            var = ((a - mean) ** 2).mean(dim=0)
            total = total + self.lambda_flux_uni * (
                var / (mean ** 2 + 1e-12)).sum()
        return total


def _adabelief(loss_fn, x0, lower, upper, n_iter, lr, b1=0.9, b2=0.999,
               eps=1e-16):
    """Projected AdaBelief (Zhuang+ 2020), written from the paper."""
    x = x0.clone().requires_grad_(True)
    mt = torch.zeros_like(x)
    st = torch.zeros_like(x)
    for t in range(1, n_iter + 1):
        val = loss_fn(x)
        (g,) = torch.autograd.grad(val, x)
        with torch.no_grad():
            mt = b1 * mt + (1 - b1) * g
            st = b2 * st + (1 - b2) * (g - mt) ** 2 + eps
            mhat = mt / (1 - b1 ** t)
            shat = st / (1 - b2 ** t)
            x -= lr * mhat / (shat.sqrt() + eps)
            x.clamp_(min=lower, max=upper)
        x.requires_grad_(True)
    return x.detach()


def fit_roi(data, sigma_2, psf, s, kwargs_init, kwargs_down, kwargs_up,
            lambda_scales=1.0, lambda_hf=1.0, lambda_pos=100.0, W=None,
            lambda_pts=0.0, pts_weights=None, lambda_flux_uni=0.0,
            n_iter=5000, lr=1e-2, fixed_keys=(), polish_lbfgsb=False):
    """Independent minimization of the joint-deconvolution objective.

    Takes the SAME problem definition as the core (same init, same
    bounds, same regularization constants) and minimizes with this
    module's own machinery: torch autograd + projected AdaBelief +
    a closed-form per-epoch GLS flux solve at the fitted
    positions/background (the model is linear in the fluxes).
    """
    prob = RoiProblem(data, sigma_2, psf, s, lambda_scales=lambda_scales,
                      lambda_hf=lambda_hf, lambda_pos=lambda_pos, W=W,
                      lambda_pts=lambda_pts, pts_weights=pts_weights,
                      lambda_flux_uni=lambda_flux_uni)

    # flatten the free pytree deterministically; fixed_keys stay at init
    fixed_keys = set(fixed_keys)
    fixed_vals = {(grp, key): torch.as_tensor(
        np.asarray(kwargs_init[grp][key], np.float64))
        for grp, key in fixed_keys}
    names, shapes, pieces, lo, hi = [], [], [], [], []
    for grp in ("kwargs_analytic", "kwargs_background"):
        for key in sorted(kwargs_init[grp]):
            if (grp, key) in fixed_keys:
                continue
            v = np.asarray(kwargs_init[grp][key], np.float64).ravel()
            names.append((grp, key))
            shapes.append(np.asarray(kwargs_init[grp][key]).shape)
            pieces.append(v)
            lo.append(np.broadcast_to(
                np.asarray(kwargs_down[grp][key], np.float64),
                v.shape).ravel())
            hi.append(np.broadcast_to(
                np.asarray(kwargs_up[grp][key], np.float64),
                v.shape).ravel())
    x0 = torch.as_tensor(np.concatenate(pieces))
    lower = torch.as_tensor(np.concatenate(lo))
    upper = torch.as_tensor(np.concatenate(hi))

    def unpack(x):
        kw = {"kwargs_analytic": {}, "kwargs_background": {},
              "kwargs_sersic": {}}
        off = 0
        for (grp, key), shp in zip(names, shapes):
            size = int(np.prod(shp)) if shp else 1
            kw[grp][key] = x[off:off + size].reshape(shp)
            off += size
        for (grp, key), val in fixed_vals.items():
            kw[grp][key] = val
        return kw

    x = _adabelief(lambda xx: prob.loss(unpack(xx)), x0, lower, upper,
                   n_iter, lr)
    if polish_lbfgsb:
        # exact quasi-Newton polish — valid when the nonsmooth l1 term
        # is constant (h in fixed_keys), where the objective is smooth
        bnds = [(float(l) if math.isfinite(l) else None,
                 float(u) if math.isfinite(u) else None)
                for l, u in zip(lower.tolist(), upper.tolist())]
        res = _scipy_lbfgsb(lambda xx: prob.loss(unpack(xx)),
                            np.asarray(x), bnds, maxiter=2000)
        x = torch.as_tensor(res.x)
    kw = unpack(x)
    kw = {g: {k: v.detach().clone() for k, v in d.items()}
          for g, d in kw.items()}

    # exact GLS flux polish (linear in a): per-epoch normal equations
    N, M = prob.n_epochs, kw["kwargs_analytic"]["c_x"].shape[0]
    with torch.no_grad():
        a_eye = torch.eye(M, dtype=torch.float64)
        basis = []
        zero_bg = {"h": torch.zeros_like(kw["kwargs_background"]["h"]),
                   "mean": torch.zeros(N, dtype=torch.float64)}
        for j in range(M):
            kw_j = {"kwargs_analytic": {**kw["kwargs_analytic"],
                                        "a": a_eye[j].repeat(N)},
                    "kwargs_background": zero_bg,
                    "kwargs_sersic": {}}
            basis.append(prob.render(kw_j))          # (N, n, n)
        B = torch.stack(basis, dim=1)                # (N, M, n, n)
        kw_c = {"kwargs_analytic": {**kw["kwargs_analytic"],
                                    "a": torch.zeros(N * M)},
                "kwargs_background": kw["kwargs_background"],
                "kwargs_sersic": {}}
        C = prob.render(kw_c)                        # (N, n, n)
        wgt = 1.0 / prob.sigma_2
        rhs = torch.einsum("nmyx,nyx->nm", B, wgt * (prob.data - C))
        mat = torch.einsum("nmyx,nkyx,nyx->nmk", B, B, wgt)
        a = torch.linalg.solve(mat, rhs)             # (N, M)
        kw["kwargs_analytic"]["a"] = a.reshape(-1)
        model = prob.render(kw)
        chi2 = float((((prob.data - model) ** 2) / prob.sigma_2).sum()
                     / model.numel())
        final_loss = float(prob.loss(kw))
    return {
        "kwargs": {g: {k: np.asarray(v) for k, v in d.items()}
                   for g, d in kw.items()},
        "fluxes": np.asarray(a),
        "reduced_chi2": chi2,
        "loss": final_loss,
    }


def fit_psf_grid(image, noisemap, s, fwhm_x, fwhm_y, beta, W, lam=1.0,
                 n_iter=3000, lr=5e-4):
    """Independent phase 2 of the narrow-PSF fit: the free pixel grid.

    Same spec as core/psf/build.py phase 2: Moffat fixed at the
    analytic solution, free per-star fluxes/positions and the grid g
    with t = normalize(Moffat + g); starlet-l1 on g over the detail
    scales with per-coefficient noise weights W (passed in — W is part
    of the problem definition, computed closed-form by the core);
    masked chi2 data term with the star-0 position pin; this module's
    own projected AdaBelief.

    Returns the final reduced chi2 (per-star mean over unmasked
    pixels) and the normalized narrow PSF.
    """
    image = np.asarray(image, np.float64)
    noisemap = np.asarray(noisemap, np.float64)
    n_stars, n_pix = image.shape[0], image.shape[-1]
    m = n_pix * s
    L = 2 * m
    n_sc = int(math.log2(m))

    masks = torch.as_tensor(np.isfinite(image))
    scale = float(np.nanmax(image))
    data = torch.as_tensor(np.nan_to_num(image / scale))
    sig2 = torch.as_tensor(
        np.where(np.isfinite(image),
                 np.nan_to_num(noisemap / scale, nan=1e8) ** 2, 1.0))
    good = masks.sum(dim=(-2, -1)).to(torch.float64)
    W_t = torch.as_tensor(np.asarray(W, np.float64))

    r_hat = _r_hat(L)
    moffat = _moffat_fine(m, s, torch.as_tensor(float(fwhm_x)),
                          torch.as_tensor(float(fwhm_y)),
                          torch.as_tensor(float(beta)))
    a0 = np.clip(np.nansum(image / scale, axis=(1, 2)), 1e-3, None)

    # [a(N), x0(N), y0(N), g(m*m)]
    x_init = np.concatenate([a0, np.zeros(2 * n_stars), np.zeros(m * m)])
    lower = torch.as_tensor(np.concatenate(
        [np.zeros(n_stars), np.full(2 * n_stars, -3.0),
         np.full(m * m, -np.inf)]))
    upper = torch.as_tensor(np.concatenate(
        [np.full(n_stars, np.inf), np.full(2 * n_stars, 3.0),
         np.full(m * m, np.inf)]))

    def loss(x):
        a = x[:n_stars]
        sx = x[n_stars:2 * n_stars]
        sy = x[2 * n_stars:3 * n_stars]
        g = x[3 * n_stars:].reshape(m, m)
        t = moffat + g
        t = t / t.sum()
        t_hat = torch.fft.rfft2(t, s=(L, L))
        model = _render(t_hat[None], r_hat, a, sx, sy, m, s)
        res2 = ((data - model) ** 2) / sig2
        res2 = torch.where(masks, res2, torch.zeros(()))
        chi2 = res2.sum(dim=(-2, -1)) / torch.clamp(good, min=1.0)
        pin = 0.5 * ((sx[0] / 1e-3) ** 2 + (sy[0] / 1e-3) ** 2)
        coeffs = _starlet(g, n_sc)
        reg = lam * (W_t[:-1] * coeffs[:-1].abs()).sum()
        return 0.5 * chi2.sum() * n_pix ** 2 + pin + reg

    x = _adabelief(loss, torch.as_tensor(x_init), lower, upper,
                   n_iter, lr)
    with torch.no_grad():
        a = x[:n_stars]
        sx = x[n_stars:2 * n_stars]
        sy = x[2 * n_stars:3 * n_stars]
        g = x[3 * n_stars:].reshape(m, m)
        t = moffat + g
        t = t / t.sum()
        t_hat = torch.fft.rfft2(t, s=(L, L))
        model = _render(t_hat[None], r_hat, a, sx, sy, m, s)
        res2 = ((data - model) ** 2) / sig2
        res2 = torch.where(masks, res2, torch.zeros(()))
        chi2 = float((res2.sum(dim=(-2, -1))
                      / torch.clamp(good, min=1.0)).mean())
    return {"chi2": chi2, "narrow_psf": np.asarray(t),
            "loss": float(loss(x))}
