"""Shared micro-benchmark helper (used by bench.py and tools/).

The naive pattern ``scan(lambda c, _: (c, fn(c)))`` has a loop-invariant
body: XLA's loop-invariant code motion may hoist ``fn`` out of the scan
and the "per-iteration" time then measures one evaluation divided by
n_rep.  Here the carry is updated FROM fn's output each step, creating a
genuine loop-carried data dependence that cannot be hoisted.
"""

import time


def time_compiled_loop(fn, img, n_rep):
    """Mean per-iteration wall time of ``fn`` inside one compiled scan.

    ``fn(x) -> array``; timing fetches the result to the host
    (block_until_ready returns early on the tunneled TPU backend).
    """
    import jax

    @jax.jit
    def many(x):
        def body(c, _):
            y = fn(c)
            # FULL reduction, not one element: keeping only
            # y.ravel()[0] live lets XLA dead-code-eliminate every part
            # of fn that does not feed that element (measured on CPU:
            # the 7-scale m=128 starlet timed 38 us pruned vs 688 us
            # with all scales live — 18x), which biased XLA-vs-Pallas
            # comparisons in XLA's favor: an opaque pallas_call cannot
            # be pruned
            s = y.sum()
            # loop-carried dependence: next input depends on this output
            return x * (1.0 + 1e-12 * s), s

        _, ys = jax.lax.scan(body, x, None, length=n_rep)
        return ys.sum()

    float(many(img))             # compile + first run
    # perturbed input prepared OUTSIDE the timed window: an eager device
    # multiply costs whole dispatch round-trips on the tunneled backend
    # and would be billed to the loop.  Best-of-3 for the same reason as
    # time_vg_loop (transient tenancy slowdowns).
    best = float("inf")
    for rep in range(1, 4):
        img_p = (img * (1 + 1e-6 * rep)).block_until_ready()
        t0 = time.perf_counter()
        float(many(img_p))
        best = min(best, time.perf_counter() - t0)
    return best / n_rep


def compiled_cost(fn, *args):
    """(bytes_accessed, flops) of ``jit(fn)(*args)`` by XLA cost analysis.

    Static program properties — a driver-verifiable record of the
    per-call HBM traffic and FLOPs (note: a lax.scan/while body is
    counted ONCE, not times the trip count, so pass the per-iteration
    function, e.g. a loss value_and_grad, not a whole optimizer loop).
    """
    import jax

    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-device list
        ca = ca[0]
    return (float(ca.get("bytes accessed", float("nan"))),
            float(ca.get("flops", float("nan"))))


def psf_pixel_phase_cost(batch, n_stars, n_pix, s, dft_pad=16):
    """(bytes, flops) of one vmapped pixel-phase PSF value_and_grad.

    The per-iteration program of the dominant PSF-fit phase (AdaBelief
    over the pixel grid) at the given batch shape, on the CURRENT ops
    backends — the driver-verifiable roofline evidence emitted by
    bench.py each round (tools/psf_roofline.py adds the wall-clock
    side).  ``dft_pad`` mirrors ``build_psf(dft_pad=...)`` and defaults
    to the SHIPPED config default so the cost analysis describes the
    same program as the headline ``psf_fits_per_sec`` wall; pass None
    for the full L=2m padding (the ``psf_fits_per_sec_fullpad``
    continuity lane).
    """
    import jax
    import jax.numpy as jnp

    from .. import ops
    from ..core.psf.build import _phase_losses
    from ..core.starlet import n_starlet_scales

    m = n_pix * s
    _, _, loss_pixels = _phase_losses(n_stars, n_pix, s, False,
                                      ops.get_dft_precision())
    free = {
        "kwargs_gaussian": {
            "a": jnp.ones((batch, n_stars), jnp.float32),
            "x0": jnp.zeros((batch, n_stars), jnp.float32),
            "y0": jnp.zeros((batch, n_stars), jnp.float32)},
        "kwargs_background": {
            "background": jnp.zeros((batch, m * m), jnp.float32)},
    }
    fixed = {
        "kwargs_moffat": {
            "fwhm_x": jnp.full((batch,), 2.5, jnp.float32),
            "fwhm_y": jnp.full((batch,), 2.5, jnp.float32),
            "beta": jnp.full((batch,), 2.5, jnp.float32)},
        "kwargs_distortion": {
            k: jnp.zeros((batch, 5), jnp.float32)
            for k in ("dilation_x", "dilation_y", "shear")},
    }
    consts = {
        "data": jnp.zeros((batch, n_stars, n_pix, n_pix), jnp.float32),
        "sigma_2": jnp.ones((batch, n_stars, n_pix, n_pix), jnp.float32),
        "masks": jnp.ones((batch, n_stars, n_pix, n_pix), bool),
        "stamp_coordinates": jnp.zeros((batch, n_stars, 2), jnp.float32),
        "W": jnp.ones((batch, n_starlet_scales(m) + 1, m, m),
                      jnp.float32),
        "lam": jnp.asarray(1.0, jnp.float32),
        "fixed": fixed,
    }
    in_axes_consts = {"data": 0, "sigma_2": 0, "masks": 0,
                      "stamp_coordinates": 0, "W": 0, "lam": None,
                      "fixed": 0}
    if ops.get_irfft_backend() == "mxu":
        from ..core.psf.build import psf_fft_length
        from ..ops.dft import make_dft_mats

        consts["dft_mats"] = make_dft_mats(
            psf_fft_length(m, s, dft_pad), m, pool=s)
        in_axes_consts["dft_mats"] = None

    vg = jax.vmap(jax.value_and_grad(loss_pixels),
                  in_axes=(0, in_axes_consts))
    return compiled_cost(vg, free, consts), (vg, free, consts)


def star_fit_phase_cost(n_stars=8, n_epochs=50, n_pix=16, s=2):
    """(bytes, flops) of one batched star-photometry value_and_grad.

    The per-iteration program of the batched joint star fit
    (core/deconv/batched._fit_stars: a vmap over stars of the AdaBelief
    loss+grad) at bench.py's ``run_star_photometry_bench`` shape, on the
    CURRENT ops backends — the third hot task's driver-verifiable
    roofline evidence, mirroring :func:`psf_pixel_phase_cost`.

    Returns ``((bytes, flops), (vg, free, consts_pair))`` where ``vg``
    has the ``vg(free, consts)`` signature :func:`time_vg_loop` expects
    (the star-independent shared consts travel inside the pair, as an
    ARGUMENT of the traced program per the core/optimize.py contract).
    """
    import jax
    import jax.numpy as jnp

    from .. import ops
    from ..core.deconv.batched import (_prepare_stars, _shared_consts,
                                       _star_loss_fn)

    mp = n_pix * s
    data = jnp.ones((n_stars, n_epochs, n_pix, n_pix), jnp.float32)
    noise = jnp.ones((n_stars, n_epochs, n_pix, n_pix), jnp.float32)
    psf = jnp.ones((n_stars, n_epochs, mp, mp), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), n_stars)
    backend = ops.get_irfft_backend()
    free0, _, _, consts, _ = _prepare_stars(
        data, noise, psf, keys, n_epochs, n_pix, s, False, False, backend)
    shared = _shared_consts(n_pix, s, backend)
    loss_fn = _star_loss_fn(n_epochs, n_pix, s, False,
                            ops.get_dft_precision())

    def vg(free, consts_pair):
        per_star, shared_c = consts_pair

        def one(f, c):
            return jax.value_and_grad(loss_fn)(f, {**c, **shared_c})

        return jax.vmap(one)(free, per_star)

    consts_pair = (consts, shared)
    return compiled_cost(vg, free0, consts_pair), (vg, free0, consts_pair)


def time_vg_loop(vg, free, consts, n_rep=200, n_best_of=3):
    """Best-of-N per-iteration wall of ``vg`` inside one compiled scan.

    The carry is a gradient-descent update of the parameters — a real
    loop-carried data dependence, so XLA cannot hoist the body (same
    rationale as :func:`time_compiled_loop`).  One compile; the timed
    run repeats ``n_best_of`` times with perturbed restarts and keeps
    the fastest — the shared tunneled backend shows transient multi-x
    slowdowns from other tenants (measured: the same program 15.5 then
    0.28 ms/iter minutes apart), so a single sample can overstate the
    per-iteration time by an order of magnitude.
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(free, consts):
        def body(c, _):
            value, grad = vg(c, consts)
            c = jax.tree_util.tree_map(
                lambda x, g: x - 1e-9 * g, c, grad)
            return c, jnp.sum(value)

        _, ys = jax.lax.scan(body, free, None, length=n_rep)
        return ys[-1]

    float(many(free, consts))    # compile + first run
    best = float("inf")
    for rep in range(1, n_best_of + 1):
        f = jax.tree_util.tree_map(lambda x: x * (1 + 1e-6 * rep), free)
        t0 = _time.perf_counter()
        float(many(f, consts))
        best = min(best, _time.perf_counter() - t0)
    return best / n_rep
