"""Multiscale conditional Glow (Flax, NHWC).

Re-design of ``MultiScaleCondGlow`` (models/glow_msc.py:474-968): a
conditional normalizing flow p(y|x) over the 3-channel solution fields,
conditioned on a DenseNet feature pyramid of the permeability x.

Idiomatic differences from the reference:
* Conditioning feature sizes are computed statically from the block configs
  — no dummy-forward shape probe (models/glow_msc.py:713-714).
* ``generate``/``sample`` thread explicit PRNG keys; ``sample`` vmaps one
  generate over the sample axis instead of a Python loop
  (models/glow_msc.py:861-872).
* All methods are pure; BN state (inside dense coupling blocks) is a flax
  ``batch_stats`` collection mutated only by training steps.

Channel/shape bookkeeping matches models/glow_msc.py:874-891 exactly:
z_i = (y_ch * f^2 / 2) cumulative per split, top latent keeps all channels.
(Shapes only — the squeeze pixel ORDER deliberately differs; see
flow.Squeeze.)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .codec import DenseBlock, DenseLayer, Transition
from .flow import (Conv2dZeros, FirstRevBlock, RevBlock, gaussian_diag)

__all__ = ["InputEncoder", "MultiScaleCondGlow", "encoder_feature_sizes",
           "glow_z_shapes"]


def glow_z_shapes(img_size, y_channels: int, flow_blocks: Sequence[int],
                  factor: int = 2):
    """Latent shapes per split (reference models/glow_msc.py:874-891), NHWC."""
    if isinstance(img_size, int):
        img_size = [img_size, img_size]
    feature_size = list(img_size)
    n_features = y_channels
    z_shapes = []
    for _ in range(len(flow_blocks) - 2):
        feature_size = [fs // factor for fs in feature_size]
        n_features = n_features * factor ** 2 // 2
        z_shapes.append((feature_size[0], feature_size[1], n_features))
    feature_size = [fs // factor for fs in feature_size]
    z_shapes.append((feature_size[0], feature_size[1],
                     n_features * factor ** 2))
    return z_shapes


def encoder_feature_sizes(in_channels: int, blocks: Sequence[int],
                          growth_rate: int = 16, init_features: int = 48):
    """Static per-scale conditioning channel counts (replaces the reference's
    dummy-forward probe, models/glow_msc.py:537-550).

    Scale 0 = in_channels + (init_features - 1) in_conv maps +
    (num_layers - 1) dense layers — equal to the familiar
    ``init_features + (n-1)·growth`` only when in_channels == 1.
    """
    sizes = []
    for i, num_layers in enumerate(blocks):
        if i == 0:
            num_features = (in_channels + init_features - 1
                            + (num_layers - 1) * growth_rate)
        else:
            num_features = num_features + num_layers * growth_rate
        sizes.append(num_features)
        if i < len(blocks) - 1:
            num_features //= 2
    return sizes


class DenseBlockInput(nn.Module):
    """Input dense block keeping full resolution (models/glow_msc.py:28-48).

    in_conv produces (init_features - 1) maps which are concatenated with
    the input, then (num_layers - 1) DenseLayers.
    """
    num_layers: int
    init_features: int
    growth_rate: int
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .codec import torch_conv_init
        out = nn.Conv(self.init_features - 1, (3, 3), padding=1,
                      use_bias=True, kernel_init=torch_conv_init,
                      name="in_conv")(x)
        out = jnp.concatenate([x, out], axis=-1)
        for i in range(self.num_layers - 1):
            out = DenseLayer(self.growth_rate, self.drop_rate, bn_size=4,
                             name=f"denselayer{i + 1}")(out, train)
        return out


class InputEncoder(nn.Module):
    """DenseNet feature pyramid over x -> multiscale conditions + top prior.

    Reference: models/glow_msc.py:474-550.  Returns (conditions, prior)
    where conditions[i] conditions flow block i and the prior parameterizes
    p(z_top | x).
    """
    in_channels: int
    latent_features: int
    blocks: Sequence[int]
    growth_rate: int = 16
    init_features: int = 48
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        conditions = []
        num_features = 0
        for i, num_layers in enumerate(self.blocks):
            if i == 0:
                x = DenseBlockInput(num_layers, self.init_features,
                                    self.growth_rate, self.drop_rate,
                                    name=f"dense_block{i + 1}")(x, train)
                # DenseBlockInput concatenates the input itself with its
                # (init_features - 1) in_conv maps, so in_channels counts
                num_features = (self.in_channels + self.init_features - 1
                                + (num_layers - 1) * self.growth_rate)
                bottleneck = False
            else:
                x = DenseBlock(num_layers, self.growth_rate, self.drop_rate,
                               bn_size=4, name=f"dense_block{i + 1}")(x, train)
                num_features += num_layers * self.growth_rate
                bottleneck = True
            conditions.append(x)
            if i < len(self.blocks) - 1:
                x = Transition(num_features // 2, down=True,
                               bottleneck=bottleneck,
                               drop_rate=self.drop_rate,
                               name=f"trans_down{i + 1}")(x, train)
                num_features //= 2
        h = Conv2dZeros(self.latent_features * 2, name="top_latent")(x)
        mean, log_stddev = jnp.split(h, 2, axis=-1)
        return conditions, gaussian_diag(mean, log_stddev)


class MultiScaleCondGlow(nn.Module):
    """Conditional Glow p(y|x) (models/glow_msc.py:672-968).

    Methods (use via ``model.apply(vars, ..., method=...)``):
      __call__(y, x):  density evaluation y -> z, returns (z, logp, eps_list)
      generate(x):     sample one y per x with logp (the training path)
      sample(x, n):    n samples per x, vmapped generate
    """
    img_size: int
    x_channels: int
    y_channels: int
    enc_blocks: Sequence[int]
    flow_blocks: Sequence[int]
    flow_coupling: str = "dense"
    squeeze_factor: int = 2
    LU_decompose: bool = True
    train_sampling: bool = True
    # 'subpixel' (native, locality-preserving) or 'reference' (the torch
    # repo's quadrant-tile reshape — required when evaluating checkpoints
    # imported via utils/torch_import.convert_glow_state_dict)
    squeeze_order: str = "subpixel"

    def setup(self):
        if len(self.enc_blocks) != len(self.flow_blocks):
            raise ValueError(
                f"enc_blocks and flow_blocks must have equal length "
                f"(train_cglow_reverse_kl.py:72), got "
                f"{len(self.enc_blocks)} vs {len(self.flow_blocks)}")
        if self.squeeze_factor != 2:
            # the InputEncoder pyramid downsamples 2x per scale; a flow
            # squeeze factor != 2 would desynchronize conditioning and flow
            # resolutions (the reference is also factor-2 only in practice)
            raise ValueError(
                f"squeeze_factor must be 2 (got {self.squeeze_factor}): "
                f"the conditioning pyramid halves resolution per scale")
        dims = ([self.img_size] * 2 if isinstance(self.img_size, int)
                else list(self.img_size))
        scales = self.squeeze_factor ** (len(self.flow_blocks) - 1)
        if any(d % scales for d in dims):
            raise ValueError(
                f"img_size {self.img_size} must be divisible by "
                f"squeeze_factor^(n_blocks-1) = {scales} in BOTH dims "
                f"(models/glow_msc.py:415)")
        z_shapes = glow_z_shapes(self.img_size, self.y_channels,
                                 self.flow_blocks, self.squeeze_factor)
        self.z_shapes_ = z_shapes
        top_features = z_shapes[-1][-1]
        self.encoder = InputEncoder(self.x_channels, top_features,
                                    self.enc_blocks, growth_rate=16,
                                    init_features=48, name="encoder")
        blocks = []
        n_features = self.y_channels
        for i, n_layers in enumerate(self.flow_blocks):
            if i == 0:
                blocks.append(FirstRevBlock(
                    n_features, n_layers, self.flow_coupling,
                    self.LU_decompose, self.train_sampling,
                    name=f"revblock{i + 1}"))
            else:
                do_split = i != len(self.flow_blocks) - 1
                blocks.append(RevBlock(
                    n_features, n_layers, self.flow_coupling,
                    self.squeeze_factor, self.LU_decompose,
                    self.train_sampling, do_split=do_split,
                    squeeze_order=self.squeeze_order,
                    name=f"revblock{i + 1}"))
                n_features = n_features * self.squeeze_factor ** 2 // 2
        self.flow = blocks

    # --- density evaluation: y -> z (data-init / forward-KL path) ---------

    def __call__(self, y, x, return_eps: bool = False, train: bool = True):
        conditions, cond_prior = self.encoder(x, train=train)
        logdet = jnp.zeros(y.shape[0], y.dtype)
        eps_list = []
        n = len(self.flow_blocks)
        for i, block in enumerate(self.flow):
            if i == 0:
                y, ld = block(y, conditions[i], train=train)
            elif i == n - 1:
                y, ld, _ = block(y, conditions[i], train=train)
                log_prior = cond_prior.log_prob(y)
                if return_eps:
                    eps_list.append((y - cond_prior.mean)
                                    * jnp.exp(-cond_prior.log_stddev))
                logdet = logdet + log_prior
            else:
                y, ld, eps = block(y, conditions[i], return_eps=return_eps,
                                   train=train)
                if return_eps:
                    eps_list.append(eps)
            logdet = logdet + ld
        return y, logdet, (eps_list if return_eps else None)

    # --- generation: z -> y (the reverse-KL training path) ----------------

    def _generate_from(self, conditions, cond_prior, eps_list,
                       temperature: float, train: bool):
        """Reverse flow z -> y from precomputed conditioning features."""
        n = len(self.flow_blocks)
        z = cond_prior.sample(eps=eps_list[-1])
        logp = cond_prior.log_prob(z)
        for i in reversed(range(n)):
            block = self.flow[i]
            cond = conditions[i]
            if i == 0:
                z, ld = block(z, cond, reverse=True, train=train)
            else:
                eps = eps_list[i - 1] * temperature if i != n - 1 else None
                z, ld = block(z, cond, reverse=True, eps=eps, train=train)
            logp = logp + ld
        return z, logp

    def generate(self, x, eps_list=None, key=None, train: bool = True,
                 temperature: float = 1.0):
        """One sample y ~ p(y|x) per input with its log-likelihood.

        ``eps_list``: optional per-latent standard normals, ordered like
        ``glow_z_shapes`` (splits bottom-up, top latent last); None draws
        fresh noise from ``key``.  Reference: models/glow_msc.py:789-828
        (temperature scales split eps only, matching sample()'s quirk of
        leaving the top-latent eps unscaled).
        """
        if eps_list is None:
            if key is None:
                raise ValueError("generate() needs key or eps_list")
            eps_list = [e[0] for e in self.create_noise(key, 1, x.shape[0])]
        else:
            self._check_eps(eps_list)
        conditions, cond_prior = self.encoder(x, train=train)
        return self._generate_from(conditions, cond_prior, eps_list,
                                   temperature, train)

    def _check_eps(self, eps_list):
        # one latent per split + the top latent (models/glow_msc.py:806
        # asserts this; a wrong length would misalign eps with blocks and
        # fail with an opaque shape error deep in the reverse flow)
        want = len(self.flow_blocks) - 1
        if len(eps_list) != want:
            raise ValueError(
                f"eps_list must have {want} entries (len(flow_blocks)-1: "
                f"splits bottom-up, top latent last), got {len(eps_list)}")

    def sample(self, x, n_samples: int, key=None, eps_list=None,
               temperature: float | None = None, train: bool = False):
        """(n_samples, B, H, W, C) samples — one encoder pass, vmapped
        reverse flow over the sample axis (the reference loops in Python,
        models/glow_msc.py:861-872).

        Default temperature 0.7 when None (models/glow_msc.py:850-851);
        callers in the drivers pass 1.0 explicitly like the reference.
        """
        if temperature is None:
            temperature = 0.7
        if eps_list is None:
            if key is None:
                raise ValueError("sample() needs key or eps_list")
            eps_list = self.create_noise(key, n_samples, x.shape[0])
        else:
            self._check_eps(eps_list)
        conditions, cond_prior = self.encoder(x, train=train)

        def one(eps):
            return self._generate_from(conditions, cond_prior, eps,
                                       temperature, train)[0]

        return jax.vmap(one)(eps_list)

    def create_noise(self, key, n_samples: int, batch_size: int):
        """Standard normals for every latent (models/glow_msc.py:893-904)."""
        keys = jax.random.split(key, len(self.z_shapes_))
        return [jax.random.normal(k, (n_samples, batch_size) + s)
                for k, s in zip(keys, self.z_shapes_)]

    def create_zero_noise(self, batch_size: int):
        """Zero eps for the cheap predictive mean (models/glow_msc.py:906-917)."""
        return [jnp.zeros((batch_size,) + s) for s in self.z_shapes_]

    def approx_pred_mean(self, x, train: bool = False):
        """All-Gaussians-at-mean approximation (models/glow_msc.py:831-837)."""
        eps = self.create_zero_noise(x.shape[0])
        return self.generate(x, eps_list=eps, train=train)
