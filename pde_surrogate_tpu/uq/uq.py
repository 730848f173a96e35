"""Uncertainty quantification for the conditional-flow surrogate.

Parity with ``UQ_CondGlow`` (utils/uq.py:14-278): prediction at an input,
uncertainty propagation, distribution estimates at LHS-chosen locations,
reliability diagrams, and the NaN-robust test metric.

The surrogate interface is the (model, GlowState) pair; all device work is
batched and jitted through a small ``GlowSurrogate`` facade (sample /
predict / propagate), with the MC accumulation running as device-side sums
instead of the reference's per-batch Python arithmetic.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as scipy_norm

from ..ops.lhs import lhs
from ..viz.plot import plot_MC2, plot_prediction_bayes2, plot_row, save_samples

__all__ = ["GlowSurrogate", "UQCondGlow"]


class GlowSurrogate:
    """Jitted sample/predict/propagate facade over (model, state)."""

    def __init__(self, model, state, n_samples: int = 20,
                 temperature: float = 1.0):
        self.model = model
        self.state = state
        self.n_samples = n_samples
        self.temperature = temperature
        variables = {"params": state.params, "batch_stats": state.batch_stats,
                     "constants": state.constants}

        def _sample(x, key):
            return model.apply(variables, x, n_samples, key,
                               temperature=temperature, train=False,
                               method=model.sample)

        self._sample = jax.jit(_sample)

        def _propagate_one(x, key):
            """One var_sample's MC sweep: scan over chunks in ONE program.

            x: (n_chunks, B, H, W, C).  One lax.scan step = one chunk, so
            peak memory stays at n_samples x B fields and the tunnel sees
            one dispatch per var_sample (the reference's double loop was
            var_samples x n_batches dispatches, models/glow_msc.py:939-968).
            A single program over ALL (chunk, var_sample) pairs ran minutes
            and crashed the remote TPU worker — keep programs O(seconds).
            """
            n_chunks = x.shape[0]
            field = x.shape[2:4] + (model.y_channels,)

            def step(carry, t):
                xb = jax.lax.dynamic_index_in_dim(x, t, 0, keepdims=False)
                s = _sample(xb, jax.random.fold_in(key, t))
                ey, eyy = carry
                return (ey + s.mean(axis=(0, 1)),
                        eyy + (s * s).mean(axis=(0, 1))), None

            init = (jnp.zeros(field), jnp.zeros(field))
            (ey, eyy), _ = jax.lax.scan(step, init, jnp.arange(n_chunks))
            ey, eyy = ey / n_chunks, eyy / n_chunks
            return ey, eyy - ey ** 2  # total predictive var E[Y^2]-E[Y]^2

        self._propagate_one = jax.jit(_propagate_one)

    def sample(self, x, key):
        """(n_samples, B, H, W, C) samples for inputs (B, H, W, C)."""
        return self._sample(jnp.asarray(x), key)

    def predict(self, x, key):
        """(mean, var) over ``n_samples`` samples (models/glow_msc.py:925-937)."""
        s = self.sample(x, key)
        return s.mean(axis=0), s.var(axis=0)

    def propagate(self, mc_x, key, var_samples: int = 10,
                  batch_size: int = 64):
        """Uncertainty propagation (models/glow_msc.py:939-968).

        E[Y] = E_X E[Y|X]; Var[Y] = E_X Var(Y|X) + Var_X E[Y|X], with
        ``var_samples`` repetitions to estimate the estimator's own spread.
        Returns (EE, VE, EV, VV) per-pixel fields (H, W, C).

        ``mc_x``: (N, H, W, C) Monte-Carlo inputs; chunked into the largest
        divisor of N <= batch_size (all N used; falls back to trimming —
        loudly — only when N is nearly prime).
        """
        x = jnp.asarray(mc_x)
        n = len(x)
        b = max(d for d in range(1, min(batch_size, n) + 1) if n % d == 0)
        if b < max(batch_size // 2, 1):
            b = min(batch_size, n)
            n_use = (n // b) * b
            print(f"[propagate] N={n} has no divisor near {batch_size}; "
                  f"using first {n_use} MC samples")
            x = x[:n_use]
            n = n_use
        xs = x.reshape(n // b, b, *x.shape[1:])
        eys, vys = [], []
        for v in range(var_samples):
            ey, vy = self._propagate_one(xs, jax.random.fold_in(key, v))
            eys.append(ey)
            vys.append(vy)
        ey = jnp.stack(eys)
        vy = jnp.stack(vys)
        return ey.mean(0), ey.var(0), vy.mean(0), vy.var(0)


class UQCondGlow:
    """The reference's five UQ tasks over the generated MC/test datasets.

    Args:
      surrogate: GlowSurrogate.
      mc_data / test_data: (x, y) NHWC numpy arrays.
      post_dir: output directory.
    """

    def __init__(self, surrogate: GlowSurrogate, mc_data, test_data,
                 y_test_variation, post_dir: str, imsize: int,
                 batch_size: int = 64, ntrain: int = 0, epochs: int = 0,
                 key=None):
        self.s = surrogate
        self.mc_x, self.mc_y = mc_data
        self.test_x, self.test_y = test_data
        self.y_test_variation = np.asarray(y_test_variation)
        self.post_dir = post_dir
        self.imsize = imsize
        self.batch_size = batch_size
        self.ntrain = ntrain
        self.epochs = epochs
        self.key = key if key is not None else jax.random.key(0)
        os.makedirs(post_dir, exist_ok=True)

    def _batches(self, x, y):
        for i in range(0, len(x), self.batch_size):
            yield jnp.asarray(x[i:i + self.batch_size]), y[i:i + self.batch_size]

    # ------------------------------------------------------------------

    def plot_prediction_at_x(self, n_pred: int, plot_samples: bool = False):
        """Target/mean/std/error panels for random test inputs
        (utils/uq.py:45-74)."""
        save_dir = os.path.join(self.post_dir, "predict_at_x")
        os.makedirs(save_dir, exist_ok=True)
        idx = np.random.default_rng(1).permutation(len(self.test_x))[:n_pred]
        for i in idx:
            x = jnp.asarray(self.test_x[[i]])
            key = jax.random.fold_in(self.key, int(i))
            mean, var = self.s.predict(x, key)
            plot_prediction_bayes2(save_dir, self.test_y[i],
                                   np.asarray(mean[0]), np.asarray(var[0]),
                                   self.epochs, int(i))
            if plot_samples:
                samples = np.asarray(self.s.sample(x, key)[:15, 0])
                save_samples(save_dir,
                             np.concatenate([self.test_y[[i]], samples]),
                             self.epochs, int(i), "samples", nrow=4)

    def propagate_uncertainty(self, manual_scale: bool = False,
                              var_samples: int = 10):
        """MC input/output statistics vs surrogate propagation
        (utils/uq.py:77-146); also dumps a .mat for external plotting."""
        out_dir = os.path.join(self.post_dir, "out_stats")
        os.makedirs(out_dir, exist_ok=True)
        mean_x = self.mc_x.mean(0)
        var_x = self.mc_x.var(0)
        mean_y = self.mc_y.mean(0)
        var_y = self.mc_y.var(0)
        plot_row([mean_x[..., 0], var_x[..., 0]], out_dir, "input_MC",
                 plot_fn="contourf", cmap="jet")

        ee, ve, ev, vv = self.s.propagate(self.mc_x, self.key,
                                          var_samples=var_samples,
                                          batch_size=self.batch_size)
        ee, ve, ev, vv = (np.asarray(a) for a in (ee, ve, ev, vv))
        plot_MC2(out_dir, mean_y, ee, ve, True, self.ntrain,
                 manual_scale=manual_scale)
        plot_MC2(out_dir, var_y, ev, vv, False, self.ntrain)
        import scipy.io
        scipy.io.savemat(os.path.join(out_dir, "out_stats.mat"), {
            "sample_mean": np.moveaxis(mean_y, -1, 0),
            "sample_var": np.moveaxis(var_y, -1, 0),
            "y_pred_EE": np.moveaxis(ee, -1, 0),
            "y_pred_VE": np.moveaxis(ve, -1, 0),
            "y_pred_EV": np.moveaxis(ev, -1, 0),
            "y_pred_VV": np.moveaxis(vv, -1, 0)})
        return ee, ve, ev, vv

    def plot_dist(self, num_loc: int):
        """KDE of p(y) at LHS-chosen pixels vs Monte Carlo
        (utils/uq.py:149-192)."""
        assert num_loc > 0
        locations = lhs(2, num_loc, criterion="c", rng=3)
        idx = (locations * self.imsize).astype(int)
        preds, targets = [], []
        for b, (x, y) in enumerate(self._batches(self.mc_x, self.mc_y)):
            key = jax.random.fold_in(self.key, 555 + b)
            s = self.s.sample(x, key)                  # (S, B, H, W, C)
            # gather the probe pixels on device; fetch only (B, n_loc, C)
            # (fetching the full sample tensor cost ~60 MB/batch over the
            # tunnel)
            at_loc = s[:, :, idx[:, 0], idx[:, 1], :].mean(axis=0)
            preds.append(np.asarray(at_loc))
            targets.append(y[:, idx[:, 0], idx[:, 1], :])
        pred = np.concatenate(preds, 0)                # (M, n_loc, C)
        target = np.concatenate(targets, 0)
        dist_dir = os.path.join(self.post_dir, "dist_estimate")
        os.makedirs(dist_dir, exist_ok=True)
        import matplotlib.pyplot as plt
        from scipy.stats import gaussian_kde
        for loc in range(len(locations)):
            fig, axes = plt.subplots(1, 3, figsize=(12, 4))
            for c, ax in enumerate(axes):
                for data, color, ls, label in (
                        (target[:, loc, c], "b", "--", "Monte Carlo"),
                        (pred[:, loc, c], "r", "-", "Surrogate")):
                    if np.std(data) < 1e-12:
                        continue
                    kde = gaussian_kde(data)
                    grid = np.linspace(data.min(), data.max(), 200)
                    ax.plot(grid, kde(grid), color=color, ls=ls, label=label)
                ax.legend()
            fig.savefig(os.path.join(
                dist_dir, f"loc_({locations[loc][0]:.5f}, "
                          f"{locations[loc][1]:.5f}).pdf"), dpi=300)
            plt.close(fig)
        return pred, target

    def plot_reliability_diagram(self, label: str = "Conditional Glow",
                                 save_time: bool = True):
        """Empirical coverage of Gaussian predictive intervals
        (utils/uq.py:195-241)."""
        p_list = np.linspace(0.01, 0.99, 10)
        n_channels = self.mc_y.shape[-1]
        # predict once per batch (the reference re-samples the surrogate for
        # every p — 10x redundant, utils/uq.py:203-223), then sweep p on host
        stats = []
        for b, (x, y) in enumerate(self._batches(self.mc_x, self.mc_y)):
            if save_time and b > 4:
                continue
            key = jax.random.fold_in(self.key, 777 + b)
            mean, var = self.s.predict(x, key)
            stats.append((np.asarray(mean), np.sqrt(np.asarray(var)), y))
        freq = []
        for p in p_list:
            count = np.zeros(n_channels)
            numels = 0
            for mean, std, y in stats:
                lo, hi = scipy_norm.interval(p, loc=mean, scale=std)
                count += ((y >= lo) & (y <= hi)).sum(axis=(0, 1, 2))
                numels += y.size / n_channels
            freq.append(count / numels)
        rel_dir = os.path.join(self.post_dir, "uncertainty_quality")
        os.makedirs(rel_dir, exist_ok=True)
        freq = np.stack(freq, 0)
        import matplotlib.pyplot as plt
        for i in range(freq.shape[-1]):
            plt.figure()
            plt.plot(p_list, freq[:, i], "r", label=label)
            plt.plot(np.linspace(0, 1, 100), np.linspace(0, 1, 100), "k--",
                     label="Ideal")
            plt.xlabel("Probability")
            plt.ylabel("Frequency")
            plt.legend(loc="upper left")
            plt.savefig(os.path.join(rel_dir, f"reliability_diagram_{i}.pdf"),
                        dpi=300)
            plt.close()
        out = np.zeros((len(p_list), 1 + n_channels))
        out[:, 0] = p_list
        out[:, 1:] = freq
        np.savetxt(os.path.join(rel_dir, "reliability_diagram.txt"), out)
        return freq

    def test_metric(self, handle_nan: bool = True):
        """NaN-robust NRMSE/R^2 of the predictive mean (utils/uq.py:244-278)."""
        rel, sse = [], []
        num_nan_inf = 0
        for b, (x, y) in enumerate(self._batches(self.test_x, self.test_y)):
            key = jax.random.fold_in(self.key, 999 + b)
            mean, _ = self.s.predict(x, key)
            mean = np.asarray(mean)
            if handle_nan:
                bad = ~np.isfinite(mean).all(axis=(1, 2, 3))
                num_nan_inf += int(bad.sum())
                mean, y = mean[~bad], y[~bad]
            if len(mean) == 0:
                continue
            err2 = ((mean - y) ** 2).sum(axis=(1, 2))
            rel.append(np.sqrt(err2 / (y ** 2).sum(axis=(1, 2))))
            sse.append(err2)
        if rel:
            relative_l2 = np.concatenate(rel, 0).mean(0)
            r2 = 1 - np.concatenate(sse, 0).sum(0) / self.y_test_variation
        else:
            # every batch NaN-filtered away (fully diverged checkpoint):
            # still report the abnormal-rate stats below instead of crashing
            nc = self.test_y.shape[-1]  # NHWC
            relative_l2 = np.full(nc, np.nan)
            r2 = np.full(nc, np.nan)
        print(relative_l2)
        print(r2)
        np.savetxt(os.path.join(self.post_dir, "nrmse_test.txt"), relative_l2)
        np.savetxt(os.path.join(self.post_dir, "r2_test.txt"), r2)
        if handle_nan:
            abnormal_rate = num_nan_inf / len(self.test_x)
            print(f"num_nan_inf: {num_nan_inf}")
            print(f"abnormal rate: {abnormal_rate:.6f}")
            np.savetxt(os.path.join(self.post_dir, "log_stats.txt"),
                       [num_nan_inf, len(self.test_x), abnormal_rate])
        return relative_l2, r2
