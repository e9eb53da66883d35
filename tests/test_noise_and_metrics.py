"""propagate_noise statistics and bookkeeping metrics."""

import numpy as np
import pytest


def _toy_model(n_epochs=4, n_pix=16, s=2):
    from lightcurver_tpu.core.deconv.model import DeconvModel
    from lightcurver_tpu.utilities.synthetic import moffat_np

    m = n_pix * s
    psf = np.broadcast_to(moffat_np(m, s, 3.0, 3.0, 2.5),
                          (n_epochs, m, m))
    return DeconvModel(psf, s, n_pix, n_epochs, 1)


class TestPropagateNoise:
    def test_shapes_and_positivity(self):
        from lightcurver_tpu.core.noise import propagate_noise

        model = _toy_model()
        noisemap = np.full((4, 16, 16), 0.5, np.float32)
        W = propagate_noise(model, noisemap, None, num_samples=100)[0]
        m = model.m
        assert W.shape == (int(np.log2(m)) + 1, m, m)
        assert (np.asarray(W) > 0).all()

    def test_scales_linearly_with_noise(self):
        """W is the std of a linear push-through: doubling the noise
        doubles every weight."""
        from lightcurver_tpu.core.noise import propagate_noise

        model = _toy_model()
        noisemap = np.full((4, 16, 16), 0.5, np.float32)
        W1 = np.asarray(propagate_noise(model, noisemap, None,
                                        num_samples=100, seed=3)[0])
        W2 = np.asarray(propagate_noise(model, 2 * noisemap, None,
                                        num_samples=100, seed=3)[0])
        np.testing.assert_allclose(W2, 2 * W1, rtol=1e-4)

    def test_coarser_scales_smoother(self):
        """Spatial variation of the weights decreases with scale."""
        from lightcurver_tpu.core.noise import propagate_noise

        rng = np.random.default_rng(0)
        model = _toy_model()
        noisemap = rng.uniform(0.3, 0.7, (4, 16, 16)).astype(np.float32)
        W = np.asarray(propagate_noise(model, noisemap, None,
                                       num_samples=200)[0])
        cv = [float(np.std(w) / np.mean(w)) for w in W[:-1]]
        assert cv[-1] < cv[0]


def test_relative_loss_differential():
    from lightcurver_tpu.core.optimize import relative_loss_differential

    # converged: big initial drop, flat tail
    history = np.concatenate([np.linspace(100, 1, 90),
                              np.full(10, 1.0)])
    assert relative_loss_differential(history) == pytest.approx(0.0,
                                                                abs=1e-6)
    # not converged: still dropping in the tail
    history = np.linspace(100, 0, 100)
    assert relative_loss_differential(history) > 0.05
