"""pde_surrogate_tpu — TPU-native physics-constrained surrogates for Darcy flow.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
cics-nd/pde-surrogate (Zhu, Zabaras, Koutsourelakis & Perdikaris, JCP 394,
2019): physics-constrained convolutional encoder-decoders, multiscale
conditional normalizing flows, and per-instance neural PDE solvers for 2-D
Darcy flow in random permeability fields — built TPU-first.

Design highlights (vs the PyTorch reference):
  * NHWC layout everywhere; convolutions and stencils sized for the MXU.
  * The Sobel image-gradient + finite-difference boundary correction
    (reference: utils/image_gradient.py:24-92) is expressed as two dense
    matmuls per direction, so the whole physics loss runs on the systolic
    array with no explicit padding.
  * All models are Flax modules; training steps are pure jitted functions;
    PRNGs are explicit keys; ActNorm data-init is an explicit init transform.
  * Data parallelism via `jax.sharding.Mesh` + NamedSharding; gradient
    all-reduce rides ICI inside jit.
  * The FEniCS validation oracle (reference: utils/fenics.py) is replaced by
    a batched JAX finite-volume Darcy solver that doubles as a labeled-data
    factory (vmap over thousands of permeability samples on one chip).

Subpackage map:
  ops/       stencil filters, Darcy physics losses, samplers, LHS designs
  models/    DenseED codec, Decoder, CPPN, multiscale conditional Glow
  data/      HDF5 IO, GRF/KLE input generation, input pipelines
  solvers/   finite-volume Darcy solvers (linear + nonlinear law)
  train/     schedules, train steps, L-BFGS, checkpointing
  parallel/  mesh construction and sharding policies
  uq/        uncertainty quantification for the conditional flow
  viz/       plotting parity with the reference's utils/plot.py
  cli/       the six reference drivers, rebuilt
"""

__version__ = "0.1.0"
