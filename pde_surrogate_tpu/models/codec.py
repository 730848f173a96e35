"""Dense convolutional encoder-decoder networks (Flax, NHWC).

TPU-native re-design of the reference's DenseNet-style codec
(models/codec.py:210-370): same topology — 7x7/s2 in-conv, alternating
dense blocks and down/up transitions, a 3-conv decoding head — expressed as
Flax modules over NHWC tensors so every convolution lands on the MXU with
channels on the lane dimension.

Parity notes
------------
* Channel bookkeeping matches the reference exactly: +num_layers*growth per
  dense block, //2 per transition (models/codec.py:247-287).
* In-conv padding is 3 for even imsize, 2 for odd (models/codec.py:238-243).
* Upsampling: 'nearest' (default) uses jax.image.resize; 'bilinear' matches
  torch ``UpsamplingBilinear2d(align_corners=True)`` via a precomputed
  interpolation-matrix matmul (jax.image.resize uses half-pixel centers,
  which is a different operator).
* BatchNorm follows torch defaults (eps 1e-5, running-stat momentum 0.1 ==
  flax momentum 0.9); train steps thread ``batch_stats`` mutable state.
* ``module_size`` counts (n_params, n_conv_layers) by 'conv' in the
  parameter path, mirroring models/codec.py:14-21.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DenseED", "Decoder", "module_size", "activation"]

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))
# == variance fan_in/3.  Flax's lecun_normal default has 3x that variance and
# measurably slows early mixed-residual training (A/B vs the reference,
# docs/RESULTS.md); biases in this file are either absent or zero-init.
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                   "uniform")


def module_size(params) -> tuple[int, int]:
    """(n_params, n_conv_layers) — parity with models/codec.py:14-21."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    n_params, n_conv = 0, 0
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if "conv" in name:
            n_conv += 1
        n_params += int(np.prod(leaf.shape))
    return n_params, n_conv


def activation(name: str):
    """Output activations (models/codec.py:191-203)."""
    table = {
        "tanh": jnp.tanh, "Tanh": jnp.tanh,
        "relu": nn.relu, "ReLU": nn.relu,
        "lrelu": nn.leaky_relu, "LReLU": nn.leaky_relu,
        "sigmoid": nn.sigmoid, "Sigmoid": nn.sigmoid,
        "softplus": lambda x: nn.softplus(4.0 * x) / 4.0, "Softplus":
            lambda x: nn.softplus(4.0 * x) / 4.0,  # torch Softplus(beta=4)
    }
    if name not in table:
        raise ValueError(f"Unknown activation function: {name}")
    return table[name]


@functools.lru_cache(maxsize=16)
def _bilinear_matrix(n_in: int, scale: int = 2) -> np.ndarray:
    """(scale*n_in, n_in) align-corners interpolation operator.

    Cached as numpy (never jnp) so first use inside a jit trace cannot leak
    a tracer through the cache.
    """
    n_out = n_in * scale
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    for i in range(n_out):
        src = i * (n_in - 1) / (n_out - 1)
        lo = min(int(np.floor(src)), n_in - 2)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, lo + 1] += w
    return m


def upsample_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor x2 upsampling, NHWC (torch UpsamplingNearest2d)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def upsample_bilinear(x: jax.Array, scale: int = 2) -> jax.Array:
    """Bilinear x2 upsampling with align_corners=True (torch semantics)."""
    h, w = x.shape[-3], x.shape[-2]
    mh = _bilinear_matrix(h, scale)
    mw = _bilinear_matrix(w, scale)
    y = jnp.einsum("Hh,bhwc->bHwc", mh, x)
    return jnp.einsum("bHwc,Ww->bHWc", y, mw)


def _upsample(x: jax.Array, mode: str) -> jax.Array:
    if mode == "nearest":
        return upsample_nearest(x)
    if mode == "bilinear":
        return upsample_bilinear(x)
    raise ValueError(f"unknown upsample mode: {mode}")


def _batch_moments(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-channel (mean, var) over (B, H, W), flax-BatchNorm-exact: f32
    reductions, fast variance E[x^2]-E[x]^2 clipped at zero."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=(0, 1, 2))
    mu2 = jnp.mean(x32 * x32, axis=(0, 1, 2))
    return mu, jnp.maximum(0.0, mu2 - mu * mu)


class _SharedConcatNorm(nn.Module):
    """BatchNorm over a concat of feature groups with EXTERNALLY supplied
    per-group batch statistics.

    Declares the same parameter/variable tree as ``nn.BatchNorm`` (params
    ``scale``/``bias``, batch_stats ``mean``/``var``) so checkpoints are
    interchangeable with the default implementation.  In training mode the
    batch stats are the concatenation of the callers' per-group moments —
    numerically the per-channel stats of the concat, but computed once per
    group instead of once per consuming layer (the DenseNet O(L^2) stats
    re-reduction).  Eval mode uses the running stats, exactly as flax.
    """
    dtype: Any = None

    @nn.compact
    def __call__(self, xcat, mean, var, train: bool):
        c = xcat.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        if not train:
            mean, var = ra_mean.value, ra_var.value
        elif not self.is_initializing():
            # torch momentum 0.1 == flax momentum 0.9 (models/codec.py BN use)
            ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
            ra_var.value = 0.9 * ra_var.value + 0.1 * var
        # flax _normalize: y = (x - mean) * (rsqrt(var+eps) * scale) + bias,
        # computed in f32, result cast to the module compute dtype
        mul = jax.lax.rsqrt(var + 1e-5) * scale
        y = (xcat.astype(jnp.float32) - mean) * mul + bias
        out_dtype = self.dtype if self.dtype is not None else jnp.promote_types(
            xcat.dtype, jnp.float32)
        return y.astype(out_dtype)


class DenseLayerShared(nn.Module):
    """DenseLayer over an explicit group list with shared batch statistics.

    Same math and variable tree as ``DenseLayer`` (bottleneck-free path);
    returns the newly produced growth-channel group and its moments so the
    block can reuse them for every later layer's norm.
    """
    growth_rate: int
    drop_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, groups, means, variances, train: bool = True):
        xcat = groups[0] if len(groups) == 1 else jnp.concatenate(groups, -1)
        if train:
            mean = means[0] if len(means) == 1 else jnp.concatenate(means)
            var = (variances[0] if len(variances) == 1
                   else jnp.concatenate(variances))
        else:  # eval normalizes with running stats; batch moments unused
            mean = var = None
        y = _SharedConcatNorm(dtype=self.dtype, name="norm1")(
            xcat, mean, var, train)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, kernel_init=torch_conv_init,
                    name="conv1")(y)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return y


class _SharedGroupwiseNorm(nn.Module):
    """``_SharedConcatNorm`` that never materializes the concat: normalizes
    each feature group in place with the matching slice of the layer's
    scale/bias (and of the batch/running moments) and returns the group
    list.  Identical parameter/variable tree to ``_SharedConcatNorm`` /
    ``nn.BatchNorm`` — checkpoints are interchangeable across all three
    implementations.
    """
    dtype: Any = None

    @nn.compact
    def __call__(self, groups, mean, var, train: bool):
        c = sum(g.shape[-1] for g in groups)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        if not train:
            mean, var = ra_mean.value, ra_var.value
        elif not self.is_initializing():
            ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
            ra_var.value = 0.9 * ra_var.value + 0.1 * var
        out, start = [], 0
        for g in groups:
            end = start + g.shape[-1]
            mul = jax.lax.rsqrt(var[start:end] + 1e-5) * scale[start:end]
            y = (g.astype(jnp.float32) - mean[start:end]) * mul \
                + bias[start:end]
            out_dtype = (self.dtype if self.dtype is not None
                         else jnp.promote_types(g.dtype, jnp.float32))
            out.append(y.astype(out_dtype))
            start = end
        return out


@jax.custom_vjp
def _conv3x3_f32acc(g, k):
    """3x3/pad-1 NHWC conv that accumulates (and returns) in f32 whatever
    the operand dtype.  ``preferred_element_type=f32``'s built-in VJP
    constructs a mixed-dtype conv (f32 cotangent x bf16 kernel) that lax
    rejects, so the backward below runs the two gradient convs in the
    operand dtype with the cotangent cast down once — exactly the convs
    a fused bf16 ``nn.Conv`` backward performs natively."""
    return jax.lax.conv_general_dilated(
        g, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def _conv3x3_f32acc_fwd(g, k):
    return _conv3x3_f32acc(g, k), (g, k)


def _conv3x3_f32acc_bwd(res, ct):
    g, k = res
    same_dtype_conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    _, vjp = jax.vjp(same_dtype_conv, g, k)
    return vjp(ct.astype(g.dtype))


_conv3x3_f32acc.defvjp(_conv3x3_f32acc_fwd, _conv3x3_f32acc_bwd)


class _GroupSumConv(nn.Module):
    """3x3 conv over a channel-concatenated group list WITHOUT the concat:
    ``conv(concat(groups), W) == sum_g conv(g, W[:, :, slice_g, :])`` —
    each group is read from HBM exactly once and the concatenated tensor
    never exists.  Declares the kernel with ``nn.Conv``'s tree (one
    ``kernel`` of the full fan-in, so init variance and checkpoints match
    the concat implementation bit-for-bit).
    """
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, groups):
        total_in = sum(g.shape[-1] for g in groups)
        kernel = self.param("kernel", torch_conv_init,
                            (3, 3, total_in, self.features), jnp.float32)
        out, start = None, 0
        for g in groups:
            end = start + g.shape[-1]
            k = kernel[:, :, start:end, :]
            compute = jnp.promote_types(g.dtype, jnp.float32) \
                if self.dtype is None else self.dtype
            # partial sums accumulate in f32 (preferred_element_type): one
            # fused conv rounds its f32-accumulated GEMM to the compute
            # dtype exactly once — rounding each partial to bf16 costs
            # ~0.1 rel-L2 of gradient noise, and bf16 partial-sum adds
            # diverge training outright
            o = _conv3x3_f32acc(g.astype(compute), k.astype(compute))
            out = o if out is None else out + o
            start = end
        out_dtype = (self.dtype if self.dtype is not None
                     else jnp.promote_types(groups[0].dtype, jnp.float32))
        return out.astype(out_dtype)


class DenseLayerConcatFree(nn.Module):
    """``DenseLayerShared`` with the concat eliminated (round-4 attack on
    the 23.7% concatenate/copy device-time share of the trace,
    docs/RESULTS.md): the norm scales each group in place and the conv
    consumes the group list as a sum of sliced-kernel convs.  Same
    parameter/variable tree; float-reassociation-level agreement (the sum
    order over groups differs from one fused conv).
    """
    growth_rate: int
    drop_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, groups, means, variances, train: bool = True):
        if train:
            mean = means[0] if len(means) == 1 else jnp.concatenate(means)
            var = (variances[0] if len(variances) == 1
                   else jnp.concatenate(variances))
        else:
            mean = var = None
        ys = _SharedGroupwiseNorm(dtype=self.dtype, name="norm1")(
            groups, mean, var, train)
        ys = [nn.relu(y) for y in ys]
        y = _GroupSumConv(self.growth_rate, dtype=self.dtype,
                          name="conv1")(ys)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return y


class DenseLayer(nn.Module):
    """BN -> ReLU -> 3x3 conv (+ optional 1x1 bottleneck), concat input.

    Reference: models/codec.py:43-75.
    """
    growth_rate: int
    drop_rate: float = 0.0
    bn_size: int = 8
    bottleneck: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_features = x.shape[-1]
        y = x
        norm = functools.partial(nn.BatchNorm, use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype,
                                 kernel_init=torch_conv_init)
        if self.bottleneck and in_features > self.bn_size * self.growth_rate:
            y = nn.relu(norm(name="norm1")(y))
            y = conv(self.bn_size * self.growth_rate, (1, 1), name="conv1")(y)
            y = nn.relu(norm(name="norm2")(y))
            y = conv(self.growth_rate, (3, 3), padding=1, name="conv2")(y)
        else:
            y = nn.relu(norm(name="norm1")(y))
            y = conv(self.growth_rate, (3, 3), padding=1, name="conv1")(y)
        if self.drop_rate > 0:
            y = nn.Dropout(self.drop_rate, deterministic=not train)(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseBlock(nn.Module):
    """Cascade of DenseLayers (models/codec.py:78-86).

    A slab variant (preallocate the block's final channel count, write each
    layer's growth channels in place via ``dynamic_update_slice``) was built
    to cut the concat re-copies and measured bitwise-identical but SLOWER at
    every config (f32/bs32 15.2 vs 8.8 ms; bf16/bs128 13.9 vs 11.2 ms —
    logs/slab_probe_r3.log): XLA already fuses the concat copies into the
    consumers, while the slab's dynamic_update_slice defeats that fusion.
    Removed; concat is the only implementation.
    """
    num_layers: int
    growth_rate: int
    drop_rate: float = 0.0
    bn_size: int = 8
    bottleneck: bool = False
    dtype: Any = None
    shared_stats: bool = False
    concat_free: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.shared_stats:
            return self._call_shared(x, train)
        for i in range(self.num_layers):
            x = DenseLayer(self.growth_rate, self.drop_rate, self.bn_size,
                           self.bottleneck, self.dtype,
                           name=f"denselayer{i + 1}")(x, train)
        return x

    def _call_shared(self, x, train: bool):
        """Shared-batch-stats path: each feature group's per-channel moments
        are computed ONCE when the group is produced and reused by every later
        layer's norm — eliminating the per-layer full-prefix stats re-read
        (the O(L^2) HBM term of the DenseNet topology) with the same math.
        With ``concat_free`` the per-layer prefix concats are eliminated too
        (DenseLayerConcatFree): only the block's final output is ever
        concatenated.  Variable tree identical to the default path
        (checkpoints interchangeable); bottleneck layers are not supported."""
        if self.bottleneck:
            raise ValueError("shared_stats does not support bottleneck layers")
        layer_cls = DenseLayerConcatFree if self.concat_free \
            else DenseLayerShared
        groups, means, variances = [x], [None], [None]
        if train:
            means[0], variances[0] = _batch_moments(x)
        for i in range(self.num_layers):
            g = layer_cls(self.growth_rate, self.drop_rate, self.dtype,
                          name=f"denselayer{i + 1}")(
                groups, means, variances, train)
            groups.append(g)
            if train:
                m, v = _batch_moments(g)
                means.append(m)
                variances.append(v)
            else:
                means.append(None)
                variances.append(None)
        return jnp.concatenate(groups, axis=-1)


class Transition(nn.Module):
    """Down (strided conv) or up (upsample + conv) transition.

    Reference: models/codec.py:89-160.  ``bottleneck=True`` (default) adds a
    1x1 conv + BN/ReLU before the resampling conv.
    """
    out_features: int
    down: bool
    bottleneck: bool = True
    drop_rate: float = 0.0
    upsample: str | None = "nearest"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = functools.partial(nn.BatchNorm, use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype,
                                 kernel_init=torch_conv_init)
        x = nn.relu(norm(name="norm1")(x))
        if self.down:
            if self.bottleneck:
                x = conv(self.out_features, (1, 1), name="conv1")(x)
                x = nn.relu(norm(name="norm2")(x))
                x = conv(self.out_features, (3, 3), strides=2, padding=1,
                         name="conv2")(x)
            else:
                x = conv(self.out_features, (3, 3), strides=2, padding=1,
                         name="conv1")(x)
        else:
            if self.bottleneck:
                x = conv(self.out_features, (1, 1), name="conv1")(x)
                x = nn.relu(norm(name="norm2")(x))
                if self.upsample is None:
                    x = nn.ConvTranspose(self.out_features, (3, 3), strides=(2, 2),
                                         padding=((1, 2), (1, 2)), use_bias=False,
                                         kernel_init=torch_conv_init,
                                         dtype=self.dtype, name="convT2")(x)
                else:
                    x = _upsample(x, self.upsample)
                    x = conv(self.out_features, (3, 3), padding=1,
                             name="conv2")(x)
            else:
                x = nn.ConvTranspose(self.out_features, (3, 3), strides=(2, 2),
                                     padding=((1, 2), (1, 2)), use_bias=False,
                                     kernel_init=torch_conv_init,
                                     dtype=self.dtype, name="convT1")(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return x


class LastDecoding(nn.Module):
    """Final up-transition emitting predictions (models/codec.py:163-188)."""
    out_channels: int
    bias: bool = False
    drop_rate: float = 0.0
    upsample: str = "nearest"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = functools.partial(nn.BatchNorm, use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        in_features = x.shape[-1]
        x = nn.relu(norm(name="norm1")(x))
        x = nn.Conv(in_features // 2, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_conv_init,
                    dtype=self.dtype, name="conv1")(x)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = nn.relu(norm(name="norm2")(x))
        x = _upsample(x, self.upsample)
        x = nn.Conv(in_features // 4, (3, 3), padding=1, use_bias=self.bias,
                    kernel_init=torch_conv_init,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(norm(name="norm3")(x))
        x = nn.Conv(self.out_channels, (5, 5), padding=2, use_bias=self.bias,
                    kernel_init=torch_conv_init,
                    dtype=self.dtype, name="conv3")(x)
        return x


class DenseED(nn.Module):
    """Dense convolutional encoder-decoder (models/codec.py:210-318).

    blocks must have odd length: the first half are encoder dense blocks
    (each followed by a down transition), the rest decoder blocks (each but
    the last followed by an up transition), then the decoding head.

    Input (B, H, W, in_channels) -> output (B, H, W, out_channels).
    """
    in_channels: int
    out_channels: int
    imsize: int
    blocks: Sequence[int]
    growth_rate: int = 16
    init_features: int = 48
    drop_rate: float = 0.0
    bn_size: int = 8
    bottleneck: bool = False
    out_activation: str | None = None
    upsample: str = "nearest"
    dtype: Any = None  # compute dtype (jnp.bfloat16 for MXU speed); params f32
    # shared per-group BN statistics inside dense blocks (same math + variable
    # tree; cuts the O(L^2) per-layer stats re-reduction — see DenseBlock)
    shared_stats: bool = False
    # with shared_stats: also eliminate the per-layer prefix concats
    # (DenseLayerConcatFree — the round-4 attack on the concat/copy share)
    concat_free: bool = False
    # rematerialize dense-block activations in the backward pass
    # (jax.checkpoint per block): trades HBM activation traffic for
    # recompute FLOPs — the one bandwidth lever not probed after the slab
    # and concat-free layouts both lost (VERDICT r4 item 7).  Variable
    # tree unchanged (checkpoints interchangeable with remat off).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        blocks = list(self.blocks)
        if len(blocks) > 1 and len(blocks) % 2 == 0:
            raise ValueError(
                f"length of blocks must be an odd number, but got {len(blocks)}")
        enc_blocks = blocks[: len(blocks) // 2]
        dec_blocks = blocks[len(blocks) // 2:]
        # prevent_cse=False: safe (and faster) outside lax.scan/cond
        block_cls = nn.remat(DenseBlock, static_argnums=(2,),
                             prevent_cse=False) if self.remat else DenseBlock

        pad = 3 if self.imsize % 2 == 0 else 2
        x = nn.Conv(self.init_features, (7, 7), strides=2, padding=pad,
                    use_bias=False, kernel_init=torch_conv_init,
                    dtype=self.dtype, name="in_conv")(x)
        num_features = self.init_features
        for i, num_layers in enumerate(enc_blocks):
            x = block_cls(num_layers, self.growth_rate, self.drop_rate,
                          self.bn_size, self.bottleneck, self.dtype,
                          shared_stats=self.shared_stats,
                          concat_free=self.concat_free,
                          name=f"encblock{i + 1}")(x, train)
            num_features += num_layers * self.growth_rate
            x = Transition(num_features // 2, down=True,
                           drop_rate=self.drop_rate, dtype=self.dtype,
                           name=f"transdown{i + 1}")(x, train)
            num_features //= 2
        for i, num_layers in enumerate(dec_blocks):
            x = block_cls(num_layers, self.growth_rate, self.drop_rate,
                          self.bn_size, self.bottleneck, self.dtype,
                          shared_stats=self.shared_stats,
                          concat_free=self.concat_free,
                          name=f"decblock{i + 1}")(x, train)
            num_features += num_layers * self.growth_rate
            if i < len(dec_blocks) - 1:
                x = Transition(num_features // 2, down=False,
                               drop_rate=self.drop_rate,
                               upsample=self.upsample, dtype=self.dtype,
                               name=f"transup{i + 1}")(x, train)
                num_features //= 2
        x = LastDecoding(self.out_channels, drop_rate=self.drop_rate,
                         upsample=self.upsample, dtype=self.dtype,
                         name="lasttransup")(x, train)
        if self.out_activation is not None:
            x = activation(self.out_activation)(x)
        # predictions and physics losses are always f32
        return x.astype(jnp.float32)


class Decoder(nn.Module):
    """Decoder-only generator for single-instance solving (models/codec.py:321-370).

    Maps a fixed latent (B, 16, 16, nz) through dense blocks and up
    transitions to (B, H, W, out_channels); only the weights are optimized.
    """
    dim_latent: int
    out_channels: int
    blocks: Sequence[int]
    growth_rate: int = 16
    init_features: int = 48
    drop_rate: float = 0.0
    upsample: str = "nearest"
    out_activation: str | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(self.init_features, (3, 3), padding=1, use_bias=False,
                    kernel_init=torch_conv_init,
                    dtype=self.dtype, name="conv0")(x)
        num_features = self.init_features
        for i, num_layers in enumerate(self.blocks):
            x = DenseBlock(num_layers, self.growth_rate, self.drop_rate,
                           dtype=self.dtype,
                           name=f"decblock{i + 1}")(x, train)
            num_features += num_layers * self.growth_rate
            if i < len(self.blocks) - 1:
                x = Transition(num_features // 2, down=False,
                               drop_rate=self.drop_rate,
                               upsample=self.upsample, dtype=self.dtype,
                               name=f"transup{i + 1}")(x, train)
                num_features //= 2
        x = LastDecoding(self.out_channels, drop_rate=self.drop_rate,
                         upsample=self.upsample, dtype=self.dtype,
                         name="lasttransup")(x, train)
        if self.out_activation is not None:
            x = activation(self.out_activation)(x)
        return x.astype(jnp.float32)
