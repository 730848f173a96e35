"""Normalizing-flow building blocks (Flax, NHWC) for the conditional Glow.

Functional re-design of models/glow_msc.py:51-669.  Key idiomatic moves vs
the PyTorch reference:

* logdets are returned values, accumulated functionally — no module state.
* The LU-parametrized invertible 1x1 conv computes its inverse with two
  triangular solves instead of three explicit ``inverse()`` calls
  (models/glow_msc.py:208-211) — stabler and cheaper on TPU.
* The non-LU 1x1 conv inverts in float32 (TPU-native) rather than float64
  (models/glow_msc.py:132); the LU path — the reference default — needs no
  runtime inversion on the training direction at all.
* The reference's in-place ``clamp_`` of Gaussian log-stddevs
  (models/glow_msc.py:438,453 — a straight-through clamp, since ``.data``
  mutation bypasses autograd) becomes an explicit straight-through
  estimator: ``x + stop_grad(clip(x) - x)``.
* ActNorm data-dependent init is an explicit transform
  (``collect`` -> stats -> ``data_init_from_stats``) instead of mutable
  first-call state (models/glow_msc.py:80-83).

All 4-D tensors are NHWC; channel chunking follows torch ``chunk(2, dim=C)``
semantics (first half gets the extra channel when odd).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .codec import DenseLayer

__all__ = ["ActNorm", "InvConv1x1", "InvConv1x1LU", "Conv2dZeros",
           "DenseCoupling", "WideCoupling", "AffineCouplingLayer",
           "RevLayer", "FirstRevLayer", "Squeeze", "gaussian_diag",
           "LatentEncoder", "Split", "RevBlock", "FirstRevBlock",
           "straight_through_clamp"]

LOG2PI = float(np.log(2 * np.pi))
_LOGSTD_MIN, _LOGSTD_MAX = -10.0, math.log(5.0)


def straight_through_clamp(x, lo=_LOGSTD_MIN, hi=_LOGSTD_MAX):
    """Clamp values, identity gradient (reference's in-place ``.data.clamp_``)."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


def _chunk2(x, axis=-1):
    """torch.chunk(2, dim): first part gets the extra element when odd."""
    n = x.shape[axis]
    first = -(-n // 2)
    return (jax.lax.slice_in_dim(x, 0, first, axis=axis),
            jax.lax.slice_in_dim(x, first, n, axis=axis))


class ActNorm(nn.Module):
    """Per-channel affine normalization (models/glow_msc.py:51-95).

    Identity init; data init is applied externally (see module docstring).
    ``sow``s its input under 'actnorm_stats' when that collection is mutable,
    enabling the one-batch data-init transform.
    """
    in_features: int
    return_logdet: bool = True

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        weight = self.param("weight", nn.initializers.ones,
                            (self.in_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.in_features,))
        if self.is_mutable_collection("actnorm_stats"):
            self.sow("actnorm_stats", "input", x,
                     reduce_fn=lambda prev, cur: cur)
        if reverse:
            y = (x - bias) / weight
        else:
            y = weight * x + bias
        if not self.return_logdet:
            return y
        h, w = x.shape[-3], x.shape[-2]
        logdet = jnp.sum(jnp.log(jnp.abs(weight))) * h * w
        return y, logdet


def actnorm_stats_to_params(stats_tree, params_tree, only=None):
    """Update ActNorm (weight, bias) from recorded batch inputs.

    Mirrors models/glow_msc.py:71-78: per-channel mean/std over (B, H, W);
    weight = 1/std, bias = -mean/std.

    ``only``: a tuple of tree keys naming ONE ActNorm module — update just
    that one (the sequential data-init needs per-layer updates; see
    glow_trainer.data_init_actnorm).  ``None`` updates every recorded
    ActNorm at once (the round-4 behavior — divergent for deep stacks,
    kept for the unit tests of the conversion itself).
    """
    import flax

    params = flax.core.unfreeze(params_tree)

    def visit(stats_node, params_node, path):
        for key, val in stats_node.items():
            if key == "input" and isinstance(val, (tuple, list, jnp.ndarray)):
                if only is not None and tuple(path) != tuple(only):
                    continue
                x = val[0] if isinstance(val, (tuple, list)) else val
                mean = x.mean(axis=tuple(range(x.ndim - 1)))
                # ddof=1: torch .std() is Bessel-corrected
                # (models/glow_msc.py:75); jnp defaults to ddof=0
                std = x.std(axis=tuple(range(x.ndim - 1)), ddof=1) + 1e-6
                params_node["weight"] = 1.0 / std
                params_node["bias"] = -(mean / std)
            elif isinstance(val, dict):
                visit(val, params_node[key], path + [key])

    visit(flax.core.unfreeze(stats_tree), params, [])
    return flax.core.freeze(params) if isinstance(
        params_tree, flax.core.FrozenDict) else params


def actnorm_module_paths(stats_tree):
    """Execution-ordered ActNorm module paths from a recorded stats tree.

    The density pass applies revblock1's layers first, then revblock2's,
    ... each block's revlayers in ascending order — exactly the numeric
    sort of the (block, layer, ...) indices embedded in the tree keys.
    """
    import re

    paths = []

    def walk(node, path):
        for key, val in node.items():
            if key == "input":
                paths.append(tuple(path))
            elif isinstance(val, dict):
                walk(val, path + [key])

    walk(stats_tree, [])

    def order(path):
        return tuple(int(m) for key in path
                     for m in re.findall(r"(\d+)", key))

    return sorted(paths, key=order)


class InvConv1x1(nn.Module):
    """Invertible 1x1 conv, dense weight (models/glow_msc.py:98-156).

    ``train_sampling=True`` (reverse-KL training): ``reverse`` uses the raw
    weight (the trained path), ``forward`` pays the inverse.  Initialization
    is a uniformly random rotation (QR of a Gaussian matrix).
    """
    in_channels: int
    train_sampling: bool = True

    def _weight_init(self, key, shape):
        w = jax.random.normal(key, shape, jnp.float32)
        q, _ = jnp.linalg.qr(w)
        return q

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        c = self.in_channels
        weight = self.param("weight", self._weight_init, (c, c))
        h, w = x.shape[-3], x.shape[-2]
        _, logabsdet = jnp.linalg.slogdet(weight)
        use_inverse = (reverse != self.train_sampling)
        kernel = jnp.linalg.inv(weight) if use_inverse else weight
        # Reference convention (models/glow_msc.py:128-148): forward returns
        # +log|det(applied)|, reverse returns -log|det(applied)| (the reverse
        # path accumulates log|det d forward/d input| for p(y|x)).
        log_applied = h * w * (-logabsdet if use_inverse else logabsdet)
        logdet = -log_applied if reverse else log_applied
        # 1x1 conv == channel matmul; kernel rows index input channels
        # (torch conv2d: out_c = sum_ic W[oc, ic] x[ic] => x @ W.T)
        y = jnp.einsum("...c,oc->...o", x, kernel)
        return y, logdet


class InvConv1x1LU(nn.Module):
    """LU-parametrized invertible 1x1 conv (models/glow_msc.py:159-236).

    W = P L U with L unit-lower-triangular (masked param), U strictly upper
    (masked param) + diag(sign_s * exp(log_s)).  logdet = sum(log_s) * H * W
    with no determinant computation; the off-path inverse uses triangular
    solves.  This is the reference's default (--no-LU-decompose unset).
    """
    in_channels: int
    train_sampling: bool = True

    def setup(self):
        c = self.in_channels

        # One factorization drives all five tensors (the per-param rng keys
        # flax hands out would each produce a different matrix).
        def factor(key):
            w = jax.random.normal(key, (c, c), jnp.float32)
            q, _ = jnp.linalg.qr(w)
            # lu's third output IS the row permutation: q[perm] = L @ U,
            # so q = P L U with P = eye[perm].T — no ipiv decoding needed
            lu, _, perm = jax.lax.linalg.lu(q)
            p = jnp.eye(c)[perm].T
            l = jnp.tril(lu, -1) + jnp.eye(c)
            u = jnp.triu(lu)
            s = jnp.diag(u)
            return p, l, jnp.triu(u, 1), jnp.sign(s), jnp.log(jnp.abs(s))

        init = (factor(self.make_rng("params"))
                if self.is_initializing() else (None,) * 5)
        self.p = self.variable("constants", "p", lambda: init[0])
        self.l = self.param("l", lambda _k: init[1])
        self.u = self.param("u", lambda _k: init[2])
        self.sign_s = self.variable("constants", "sign_s", lambda: init[3])
        self.log_s = self.param("log_s", lambda _k: init[4])

    def _factors(self):
        c = self.in_channels
        l = self.l * jnp.tril(jnp.ones((c, c)), -1) + jnp.eye(c)
        u = self.u * jnp.triu(jnp.ones((c, c)), 1) + jnp.diag(
            jnp.exp(self.log_s) * self.sign_s.value)
        return self.p.value, l, u

    def _weight(self):
        p, l, u = self._factors()
        return p @ l @ u

    def _inv_weight(self):
        p, l, u = self._factors()
        # (PLU)^-1 = U^-1 L^-1 P^T via triangular solves on the identity
        eye = jnp.eye(self.in_channels)
        linv = jax.scipy.linalg.solve_triangular(l, eye, lower=True,
                                                 unit_diagonal=True)
        uinv = jax.scipy.linalg.solve_triangular(u, eye, lower=False)
        return uinv @ linv @ p.T

    def __call__(self, x, reverse: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        ld0 = jnp.sum(self.log_s) * h * w  # log|det W|, no det computation
        use_inverse = (reverse != self.train_sampling)
        kernel = self._inv_weight() if use_inverse else self._weight()
        # forward: +log|det(applied)|; reverse: -log|det(applied)| — the
        # same convention as InvConv1x1 (models/glow_msc.py:213-236).
        log_applied = -ld0 if use_inverse else ld0
        logdet = -log_applied if reverse else log_applied
        y = jnp.einsum("...c,oc->...o", x, kernel)
        return y, logdet


class Conv2dZeros(nn.Module):
    """Zero-init 3x3 conv scaled by exp(3*scale) (models/glow_msc.py:240-255)."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=True,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="conv")(x)
        scale = self.param("scale", nn.initializers.zeros,
                           (self.out_channels,))
        return y * jnp.exp(scale * 3.0)


class DenseCoupling(nn.Module):
    """Dense-block coupling net (models/glow_msc.py:276-294).

    3 DenseLayers (growth 16) then BN-ReLU-Conv2dZeros reduce.
    """
    out_features: int
    num_layers: int = 3
    growth_rate: int = 16
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.num_layers):
            x = DenseLayer(self.growth_rate, self.drop_rate,
                           name=f"denselayer{i + 1}")(x, train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="norm1")(x)
        x = nn.relu(x)
        return Conv2dZeros(self.out_features, name="conv_zero")(x)


class WideCoupling(nn.Module):
    """Width-128 conv coupling net (models/glow_msc.py:259-272)."""
    out_features: int
    width: int = 128

    @nn.compact
    def __call__(self, x, train: bool = True):
        # torch-default conv init, like the reference's _CouplingNN
        from .codec import torch_conv_init
        x = nn.Conv(self.width, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_conv_init, name="conv1")(x)
        x = ActNorm(self.width, return_logdet=False, name="norm1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.width, (1, 1), use_bias=False,
                    kernel_init=torch_conv_init, name="conv2")(x)
        x = ActNorm(self.width, return_logdet=False, name="norm2")(x)
        x = nn.relu(x)
        return Conv2dZeros(self.out_features, name="conv3")(x)


class AffineCouplingLayer(nn.Module):
    """Conditional affine coupling (models/glow_msc.py:297-344).

    x1 passes through; (shift, scale) for x2 come from the coupling net fed
    with concat(x1, cond).  scale = sigmoid(h[1::2] + 2).  Odd channel
    counts follow the reference: x1 keeps the extra channel.
    """
    in_features: int
    coupling_net: str = "dense"

    @nn.compact
    def __call__(self, x, cond, reverse: bool = False, train: bool = True):
        out_channels = (self.in_features if self.in_features % 2 == 0
                        else self.in_features - 1)
        net_cls = DenseCoupling if self.coupling_net == "dense" else WideCoupling
        net = net_cls(out_channels, name="coupling_nn")
        x1, x2 = _chunk2(x, axis=-1)
        h = net(jnp.concatenate([x1, cond], axis=-1), train=train)
        shift = h[..., 0::2]
        scale = jax.nn.sigmoid(h[..., 1::2] + 2.0)
        if reverse:
            x2 = x2 / scale - shift
        else:
            x2 = (x2 + shift) * scale
        logdet = jnp.sum(jnp.log(scale).reshape(x.shape[0], -1), axis=1)
        return jnp.concatenate([x1, x2], axis=-1), logdet


class RevLayer(nn.Module):
    """ActNorm -> 1x1 conv -> coupling (models/glow_msc.py:348-377)."""
    in_features: int
    LU_decompose: bool = True
    train_sampling: bool = True
    coupling_net: str = "dense"

    @nn.compact
    def __call__(self, x, cond, reverse: bool = False, train: bool = True):
        norm = ActNorm(self.in_features, name="norm")
        conv_cls = InvConv1x1LU if self.LU_decompose else InvConv1x1
        conv = conv_cls(self.in_features, self.train_sampling, name="conv1x1")
        coupling = AffineCouplingLayer(self.in_features, self.coupling_net,
                                       name="coupling")
        if reverse:
            x, ld1 = coupling(x, cond, reverse=True, train=train)
            x, ld2 = conv(x, reverse=True)
            x, ld3 = norm(x, reverse=True)
        else:
            x, ld1 = norm(x)
            x, ld2 = conv(x)
            x, ld3 = coupling(x, cond, train=train)
        return x, ld1 + ld2 + ld3


class FirstRevLayer(nn.Module):
    """Coupling only — the flow's entry layer (models/glow_msc.py:380-397)."""
    in_features: int
    coupling_net: str = "dense"

    @nn.compact
    def __call__(self, x, cond, reverse: bool = False, train: bool = True):
        coupling = AffineCouplingLayer(self.in_features, self.coupling_net,
                                       name="coupling")
        return coupling(x, cond, reverse=reverse, train=train)


class Squeeze(nn.Module):
    """Space-to-depth by ``factor`` (role of models/glow_msc.py:400-429), NHWC.

    ``order='subpixel'`` (default): channel order (c, fy, fx)-major over
    LOCAL f x f subpixels — the standard Glow/RealNVP squeeze.  Deliberately
    NOT the reference's reshape, which splits H as (f, H/f)
    (glow_msc.py:415-421) so its output channels hold f x f coarse tiles
    (quadrants at f=2) rather than subpixels; the subpixel form preserves
    locality for the coupling convs.  Latents/eps are therefore not
    positionally comparable to the torch model's — only distributionally.

    ``order='reference'``: bit-faithful NHWC transcription of the
    reference's quadrant-tile reshape (channel = c*f^2 + s1*f + s2 where
    (s1, s2) index coarse H/W blocks).  Use this when evaluating weights
    imported from reference checkpoints (utils/torch_import), where the
    downstream convs were trained on that channel encoding.
    """
    factor: int = 2
    order: str = "subpixel"

    def __call__(self, x, reverse: bool = False):
        if self.order not in ("subpixel", "reference"):
            raise ValueError(f"Squeeze order must be 'subpixel' or "
                             f"'reference', got {self.order!r}")
        f = self.factor
        if f == 1:
            return x
        b, h, w, c = x.shape
        if self.order == "reference":
            if reverse:
                cf = c // (f * f)
                x = x.reshape(b, h, w, cf, f, f)
                x = x.transpose(0, 4, 1, 5, 2, 3)
                return x.reshape(b, h * f, w * f, cf)
            assert h % f == 0 and w % f == 0
            x = x.reshape(b, f, h // f, f, w // f, c)
            x = x.transpose(0, 2, 4, 5, 1, 3)
            return x.reshape(b, h // f, w // f, c * f * f)
        if reverse:
            cf = c // (f * f)
            x = x.reshape(b, h, w, cf, f, f)
            x = x.transpose(0, 1, 4, 2, 5, 3)
            return x.reshape(b, h * f, w * f, cf)
        assert h % f == 0 and w % f == 0
        x = x.reshape(b, h // f, f, w // f, f, c)
        x = x.transpose(0, 1, 3, 5, 2, 4)
        return x.reshape(b, h // f, w // f, c * f * f)


def gaussian_diag(mean, log_stddev):
    """Diagonal Gaussian helpers (models/glow_msc.py:432-456).

    The log-stddev straight-through clamp to [-10, log 5] is the reference's
    key sampling-stability trick (module docstring glow_msc.py:11-13).
    Returns a small namespace of pure functions.
    """
    log_stddev = straight_through_clamp(log_stddev)

    class _G:
        pass

    g = _G()
    g.mean, g.log_stddev = mean, log_stddev

    def likelihood(x):
        return -0.5 * (LOG2PI + 2.0 * log_stddev
                       + (x - mean) ** 2 * jnp.exp(-2.0 * log_stddev))

    def log_prob(x):
        return likelihood(x).reshape(x.shape[0], -1).sum(axis=1)

    def sample(key=None, eps=None):
        if eps is None:
            eps = jax.random.normal(key, mean.shape, mean.dtype)
        return mean + jnp.exp(log_stddev) * eps

    g.likelihood, g.log_prob, g.sample = likelihood, log_prob, sample
    return g


class LatentEncoder(nn.Module):
    """z1 -> (mean, log_stddev) of the split prior (models/glow_msc.py:459-471)."""
    in_channels: int

    @nn.compact
    def __call__(self, x):
        h = Conv2dZeros(self.in_channels * 2, name="conv2d")(x)
        mean, log_stddev = _chunk2(h, axis=-1)
        return gaussian_diag(mean, log_stddev)


class Split(nn.Module):
    """Factor out half the channels with a learned prior (models/glow_msc.py:554-582)."""
    in_features: int

    @nn.compact
    def __call__(self, z, reverse: bool = False, eps=None, key=None,
                 return_eps: bool = False):
        enc = LatentEncoder(self.in_features // 2, name="latent_encoder")
        if reverse:
            prior = enc(z)
            z2 = prior.sample(key=key, eps=eps)
            out = jnp.concatenate([z, z2], axis=-1)
            return out, prior.log_prob(z2)
        z1, z2 = _chunk2(z, axis=-1)
        prior = enc(z1)
        log_prob_prior = prior.log_prob(z2)
        eps_out = None
        if return_eps:
            eps_out = (z2 - prior.mean) * jnp.exp(-prior.log_stddev)
        return z1, log_prob_prior, eps_out


class RevBlock(nn.Module):
    """Squeeze -> RevLayers -> Split (models/glow_msc.py:585-633)."""
    in_features: int
    n_layers: int
    coupling_net: str = "dense"
    factor: int = 2
    LU_decompose: bool = True
    train_sampling: bool = True
    do_split: bool = True
    squeeze_order: str = "subpixel"

    def setup(self):
        feats = self.in_features * self.factor ** 2
        self.squeeze = Squeeze(self.factor, order=self.squeeze_order)
        self.revlayers = [
            RevLayer(feats, self.LU_decompose, self.train_sampling,
                     self.coupling_net, name=f"revlayer{i + 1}")
            for i in range(self.n_layers)]
        if self.do_split:
            self.split = Split(feats, name="split")

    def __call__(self, x, cond, reverse: bool = False, eps=None, key=None,
                 return_eps: bool = False, train: bool = True):
        if reverse:
            logdet = jnp.zeros(x.shape[0], x.dtype)
            y = x
            if self.do_split:
                y, lp = self.split(y, reverse=True, eps=eps, key=key)
                logdet = logdet + lp
            for layer in reversed(self.revlayers):
                y, ld = layer(y, cond, reverse=True, train=train)
                logdet = logdet + ld
            return self.squeeze(y, reverse=True), logdet
        x = self.squeeze(x)
        logdet = jnp.zeros(x.shape[0], x.dtype)
        for layer in self.revlayers:
            x, ld = layer(x, cond, train=train)
            logdet = logdet + ld
        if self.do_split:
            x, lp, eps_out = self.split(x, return_eps=return_eps)
            return x, logdet + lp, eps_out
        return x, logdet, None


class FirstRevBlock(nn.Module):
    """RevLayers with a coupling-only first layer (models/glow_msc.py:636-669)."""
    in_features: int
    n_layers: int
    coupling_net: str = "dense"
    LU_decompose: bool = True
    train_sampling: bool = True

    def setup(self):
        layers = [FirstRevLayer(self.in_features, self.coupling_net,
                                name="revlayer1")]
        for i in range(1, self.n_layers):
            layers.append(RevLayer(self.in_features, self.LU_decompose,
                                   self.train_sampling, self.coupling_net,
                                   name=f"revlayer{i + 1}"))
        self.revlayers = layers

    def __call__(self, x, cond, reverse: bool = False, train: bool = True):
        logdet = jnp.zeros(x.shape[0], x.dtype)
        layers = reversed(self.revlayers) if reverse else self.revlayers
        for layer in layers:
            x, ld = layer(x, cond, reverse=reverse, train=train)
            logdet = logdet + ld
        return x, logdet
