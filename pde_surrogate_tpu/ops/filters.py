"""Image-gradient stencils as MXU matmuls.

The reference estimates spatial derivatives of field images with Sobel
convolutions (replicate padding), scaled by the image size (= 1/dx on the
unit square), and corrects the domain boundary with a one-sided 3-point
finite-difference "modifier" matrix (reference: utils/image_gradient.py:24-92).

TPU-first design
----------------
A 2-D correlation with a separable (or low-rank) kernel applied to an H x W
image is exactly a pair of dense matmuls:

    corr(img, s (x) d) = S @ img @ D^T

where S (H x H) smooths rows with stencil ``s`` and D (W x W) differences
columns with stencil ``d`` — replicate padding becomes index clamping inside
the operator matrices.  The boundary modifier is itself a matmul, so it is
folded into D (for d/dx) or S (for d/dy) at construction time.  The full
gradient therefore runs as two MXU matmuls per direction with no padding, no
conv, and no separate correction step:

    grad_h(u) = Lh @ u @ Rh        # d/dx, horizontal
    grad_v(u) = Lv @ u @ Rv        # d/dy, vertical

Both the 3x3 kernel (rank 1) and the 5x5 kernel (rank 2) decompose this way;
the rank-2 case stacks the two components into a single (2H x H) / (W x 2W)
operator pair so it is still exactly two matmuls.

Kernel values match the reference bit-for-bit:
  * 3x3: outer([1,2,1], [-1,0,1]) / 8          (utils/image_gradient.py:28-33)
  * 5x5: ([5,8,10,8,5] (x) [-1,0,0,0,1]
          + [4,10,20,10,4] (x) [0,-1,0,1,0]) / 240   (:35-41)
  * modifier: eye with corners [4,-1] / [-1,4]        (:43-46)

Layout: images are NHWC (TPU-native).  All entry points accept (..., H, W, C)
or (..., H, W).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SobelFilter",
    "FourierFilter",
    "GaussianFilter",
    "gaussian_filter1d_weights",
    "stencil_matrix",
]


def stencil_matrix(n: int, stencil, offset: int | None = None) -> np.ndarray:
    """Dense operator matrix for a 1-D correlation with replicate padding.

    Row i of the result computes ``sum_k stencil[k] * x[clip(i + k - c, 0, n-1)]``
    where ``c`` is the stencil center — i.e. a correlation (conv2d semantics in
    the reference) with out-of-range indices clamped (replicate pad).

    Args:
      n: signal length (H or W).
      stencil: 1-D weights, odd length.
      offset: index of the stencil center; defaults to ``len(stencil)//2``.

    Returns:
      (n, n) float64 matrix M such that ``y = M @ x``.
    """
    stencil = np.asarray(stencil, dtype=np.float64)
    c = len(stencil) // 2 if offset is None else offset
    m = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for k, w in enumerate(stencil):
            j = min(max(i + k - c, 0), n - 1)
            m[i, j] += w
    return m


def _boundary_modifier(n: int) -> np.ndarray:
    """Boundary-correction matrix (reference: utils/image_gradient.py:43-46).

    Identity with corners [4, -1] (first column) and [-1, 4] (last column):
    combined with the replicate-padded Sobel value at the edge this realizes
    a 3-point one-sided finite difference on the domain boundary.
    """
    m = np.eye(n, dtype=np.float64)
    m[0:2, 0] = np.array([4.0, -1.0])
    m[-2:, -1] = np.array([-1.0, 4.0])
    return m


# Separable decompositions of the reference Sobel kernels.
# Each entry: list of (smooth_stencil, diff_stencil) rank-1 components and the
# normalizer. The 2-D kernel is sum_i outer(smooth_i, diff_i) / norm, matching
# VSOBEL_WEIGHTS_3x3 / VSOBEL_WEIGHTS_5x5 (utils/image_gradient.py:28-41).
_SOBEL_COMPONENTS = {
    3: ([( [1.0, 2.0, 1.0], [-1.0, 0.0, 1.0] )], 8.0),
    5: (
        [
            ([5.0, 8.0, 10.0, 8.0, 5.0], [-1.0, 0.0, 0.0, 0.0, 1.0]),
            ([4.0, 10.0, 20.0, 10.0, 4.0], [0.0, -1.0, 0.0, 1.0, 0.0]),
        ],
        240.0,
    ),
}


@functools.lru_cache(maxsize=32)
def _sobel_operators(imsize: int, filter_size: int, correct: bool):
    """Precompute (Lh, Rh, Lv, Rv) gradient operator matrices.

    grad_h(u) = Lh @ u @ Rh  ==  imsize * modifier-corrected d/dx
    grad_v(u) = Lv @ u @ Rv  ==  imsize * modifier-corrected d/dy

    For the rank-2 (5x5) kernel the components are stacked:
      Lh: (r*H, H) block rows, Rh: (W, r*W) block cols — a single matmul pair
      computes the sum of components via the block inner dimension... we
      instead fold the sum by concatenating along the contraction axis:
      grad_h = concat_rows(L_i) applied per component then summed; to keep it
      to exactly two matmuls we sum component results explicitly (r<=2).
    """
    comps, norm = _SOBEL_COMPONENTS[filter_size]
    mod = _boundary_modifier(imsize) if correct else np.eye(imsize)
    lh, rh, lv, rv = [], [], [], []
    for smooth, diff in comps:
        s = stencil_matrix(imsize, smooth)
        d = stencil_matrix(imsize, diff)
        # grad_h: rows smoothed, columns differenced, scaled by width, then
        # right-multiplied by modifier (utils/image_gradient.py:69-73).
        lh.append(s / norm)
        rh.append(imsize * d.T @ mod)
        # grad_v: rows differenced, columns smoothed, scaled by height, then
        # left-multiplied by modifier.T (utils/image_gradient.py:86-90).
        lv.append(imsize * mod.T @ d / norm)
        rv.append(s.T)
    # cache numpy (never jnp): a jnp constant created inside a jit trace
    # would be a tracer and leak out of the cache into later traces.
    return tuple(np.stack(x).astype(np.float32) for x in (lh, rh, lv, rv))


def _apply_lr(image: jax.Array, left: jax.Array, right: jax.Array,
              precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Compute sum_r L[r] @ image @ R[r] over the (tiny) rank axis.

    ``image``: (..., H, W) or (..., H, W, C); operators broadcast over leading
    batch dims and trailing channel dim.  Contractions are einsums so XLA
    tiles them onto the MXU; accumulation in float32.  Default precision is
    HIGHEST: physics-loss gradients shift the whole loss landscape, so the
    stencils do not ride the bf16 fast path (they are a tiny fraction of
    step FLOPs; the conv net carries the bf16 speed).
    """
    chan_last = image.ndim >= 3
    x = image
    if not chan_last:
        x = x[..., None]
    # (r, H, H') @ (..., H', W, C) -> (..., r, H, W, C)
    y = jnp.einsum("rhk,...kwc->...rhwc", left, x,
                   preferred_element_type=jnp.float32, precision=precision)
    # (..., r, H, W, C) @ (r, W, W') -> (..., H, W', C)
    z = jnp.einsum("...rhwc,rwj->...hjc", y, right,
                   preferred_element_type=jnp.float32, precision=precision)
    z = z.astype(image.dtype)
    if not chan_last:
        z = z[..., 0]
    return z


class SobelFilter:
    """Sobel image-gradient estimator with FD boundary correction.

    Drop-in equivalent of the reference ``SobelFilter``
    (utils/image_gradient.py:24-92) in NHWC layout: ``grad_h`` is d/dx
    (horizontal), ``grad_v`` is d/dy (vertical), both scaled by the image
    size, i.e. derivatives on the unit square.

    The stencil + boundary correction is realized as two matmuls per
    direction (see module docstring); there is no padding or convolution.
    """

    def __init__(self, imsize: int, correct: bool = True,
                 precision: str | jax.lax.Precision = "highest",
                 filter_size: int = 3):
        """``precision``: 'highest' (full f32, bit-parity default), 'high'
        (bf16x3 passes, ~1e-5 relative error, ~2x faster), or 'default'
        (single bf16 pass — training-speed mode).  ``filter_size`` sets the
        default stencil (3 or 5) used when grad_h/grad_v get None."""
        self.imsize = int(imsize)
        self.correct = bool(correct)
        self.filter_size = int(filter_size)
        if isinstance(precision, str):
            precision = {"highest": jax.lax.Precision.HIGHEST,
                         "high": jax.lax.Precision.HIGH,
                         "default": jax.lax.Precision.DEFAULT}[precision]
        self.precision = precision

    def _ops(self, filter_size: int):
        if filter_size not in _SOBEL_COMPONENTS:
            raise ValueError(f"filter_size must be 3 or 5, got {filter_size}")
        return _sobel_operators(self.imsize, filter_size, self.correct)

    def grad_h(self, image: jax.Array, filter_size: int | None = None
               ) -> jax.Array:
        """d/dx of (..., H, W[, C]) images (unit square, corrected boundary)."""
        lh, rh, _, _ = self._ops(filter_size or self.filter_size)
        return _apply_lr(image, lh, rh, self.precision)

    def grad_v(self, image: jax.Array, filter_size: int | None = None
               ) -> jax.Array:
        """d/dy of (..., H, W[, C]) images (unit square, corrected boundary)."""
        _, _, lv, rv = self._ops(filter_size or self.filter_size)
        return _apply_lr(image, lv, rv, self.precision)


# ---------------------------------------------------------------------------
# Auxiliary filters (reference: utils/image_gradient.py:95-293). The Gaussian
# smoother and Farid-Simoncelli ("Fourier") derivative filters are exploratory
# in the reference (no driver uses them); provided for parity.
# ---------------------------------------------------------------------------


def gaussian_filter1d_weights(sigma: float, order: int = 0,
                              truncate: float = 4.0) -> np.ndarray:
    """1-D Gaussian (derivative) filter weights.

    Port of the scipy-derived table in the reference
    (utils/image_gradient.py:95-161); orders 0..3 supported.
    """
    if order not in range(4):
        raise ValueError("Order outside 0..3 not implemented")
    sd = float(sigma)
    var = sd * sd
    lw = int(truncate * sd + 0.5)
    x = np.arange(-lw, lw + 1, dtype=np.float64)
    w = np.exp(-0.5 * x * x / var)
    w /= w.sum()
    if order == 1:
        w = (x / var) * w
    elif order == 2:
        w = (x * x / var - 1.0) * w / var
    elif order == 3:
        w = -(3.0 - x * x / var) * x * w / (var * var)
    return w


@functools.lru_cache(maxsize=32)
def _reflect_stencil_matrix(weights: tuple, n: int) -> np.ndarray:
    """Operator matrix for a 1-D correlation with reflect padding.

    Module-level cache keyed on the weight values (an instance-method
    lru_cache would pin filter objects alive and key only on identity).
    """
    c = len(weights) // 2
    m = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for k, wk in enumerate(weights):
            j = i + k - c
            # mirror boundary: j=-1 -> 1 (edge NOT repeated) — torch F.pad
            # 'reflect' == scipy 'mirror' (scipy 'reflect' repeats the edge)
            while j < 0 or j >= n:
                j = -j if j < 0 else 2 * (n - 1) - j
            m[i, j] += wk
    return m.astype(np.float32)


class GaussianFilter:
    """Separable Gaussian smoother, reflect padding (utils/image_gradient.py:164-184).

    Implemented as two matmuls with reflect-padded operator matrices —
    same mechanism as the Sobel path.
    """

    def __init__(self, sigma: float = 1.0, truncate: float = 4.0, order: int = 0):
        self.weights1d = gaussian_filter1d_weights(sigma, order, truncate)

    def _op(self, n: int):
        return _reflect_stencil_matrix(tuple(self.weights1d), n)

    def __call__(self, image: jax.Array) -> jax.Array:
        if image.ndim >= 3:  # (..., H, W, C)
            h, w = image.shape[-3], image.shape[-2]
        else:  # (H, W)
            h, w = image.shape[-2], image.shape[-1]
        op_h, op_w = self._op(h), self._op(w)
        return _apply_lr(image, op_h[None], op_w.T[None])


class FourierFilter:
    """Farid-Simoncelli matched derivative filters (utils/image_gradient.py:241-293).

    3/5/7-tap interpolator x differentiator pairs; same matmul realization,
    no boundary modifier (the reference applies none on this path).
    """

    _TAPS = {
        3: (np.array([0.229879, 0.540242, 0.229879]),
            np.array([-0.425287, 0.0, 0.425287])),
        5: (np.array([0.037659, 0.249153, 0.426375, 0.249153, 0.037659]),
            np.array([-0.109604, -0.276691, 0.0, 0.276691, 0.109604])),
        7: (np.array([0.005412, 0.069591, 0.244560, 0.360875, 0.244560,
                      0.069591, 0.005412]),
            np.array([-0.019479, -0.123915, -0.193555, 0.0, 0.193555,
                      0.123915, 0.019479])),
    }

    def __init__(self, imsize: int):
        self.imsize = int(imsize)

    def _ops(self, filter_size: int):
        return _fourier_operators(self.imsize, filter_size)

    def grad_h(self, image: jax.Array, filter_size: int = 5) -> jax.Array:
        lh, rh, _, _ = self._ops(filter_size)
        return _apply_lr(image, lh, rh)

    def grad_v(self, image: jax.Array, filter_size: int = 5) -> jax.Array:
        _, _, lv, rv = self._ops(filter_size)
        return _apply_lr(image, lv, rv)


@functools.lru_cache(maxsize=8)
def _fourier_operators(imsize: int, filter_size: int):
    p, d = FourierFilter._TAPS[filter_size]
    s = stencil_matrix(imsize, p)
    df = stencil_matrix(imsize, d)
    f32 = lambda a: np.asarray(a, dtype=np.float32)
    return f32(s[None]), f32((imsize * df.T)[None]), \
        f32((imsize * df)[None]), f32(s.T[None])
