"""Torch-checkpoint importer parity: reference weights -> flax pytree.

Builds the actual reference models (read-only at /root/reference), converts
their ``state_dict`` with utils/torch_import, and checks the flax forward
reproduces the torch forward on the same inputs.  Skipped when torch or the
reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


def _ref_models():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.codec as ref_codec
    return ref_codec


def test_codec_import_forward_parity():
    import jax

    from pde_surrogate_tpu.models.codec import DenseED
    from pde_surrogate_tpu.utils.torch_import import (check_tree_match,
                                                      convert_codec_state_dict)

    ref_codec = _ref_models()
    torch.manual_seed(0)
    blocks, imsize = [2, 3, 2], 16
    tmodel = ref_codec.DenseED(1, 3, imsize, blocks, growth_rate=4,
                               init_features=8)
    x = torch.randn(4, 1, imsize, imsize)
    tmodel.train()
    with torch.no_grad():
        tmodel(x)  # populate BatchNorm running stats
    tmodel.eval()
    with torch.no_grad():
        y_ref = tmodel(x).numpy()

    sd = {k: np.asarray(v.numpy()) for k, v in tmodel.state_dict().items()}
    params, batch_stats = convert_codec_state_dict(sd)

    jmodel = DenseED(1, 3, imsize=imsize, blocks=blocks, growth_rate=4,
                     init_features=8)
    template = jmodel.init(jax.random.key(0),
                           np.zeros((1, imsize, imsize, 1), np.float32),
                           train=False)
    assert check_tree_match(params, template["params"]) == []
    assert check_tree_match(batch_stats, template["batch_stats"]) == []

    x_nhwc = np.moveaxis(x.numpy(), 1, -1)
    y = jmodel.apply({"params": params, "batch_stats": batch_stats}, x_nhwc,
                     train=False)
    y = np.moveaxis(np.asarray(y), -1, 1)
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-5)


def test_conv_transpose_import_parity():
    """The convT mapping (flip + transpose) against reference _Transition."""
    import jax

    from pde_surrogate_tpu.models.codec import Transition
    from pde_surrogate_tpu.utils.torch_import import convert_codec_state_dict

    ref_codec = _ref_models()
    torch.manual_seed(1)
    tmod = ref_codec._Transition(in_features=8, out_features=4, down=False,
                                 upsample=None)
    x = torch.randn(2, 8, 7, 7)
    tmod.train()
    with torch.no_grad():
        tmod(x)
    tmod.eval()
    with torch.no_grad():
        y_ref = tmod(x).numpy()

    sd = {k: np.asarray(v.numpy()) for k, v in tmod.state_dict().items()}
    params, batch_stats = convert_codec_state_dict(sd)

    jmod = Transition(out_features=4, down=False, upsample=None)
    x_nhwc = np.moveaxis(x.numpy(), 1, -1)
    y = jmod.apply({"params": params, "batch_stats": batch_stats}, x_nhwc,
                   train=False)
    y = np.moveaxis(np.asarray(y), -1, 1)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-5)


def test_glow_import_forward_parity():
    """Reference MultiScaleCondGlow weights -> flax: forward (y -> z, logp)
    must agree on the same inputs when the flax model runs with
    squeeze_order='reference' (the torch repo's quadrant-tile squeeze,
    glow_msc.py:415-421)."""
    import jax

    from pde_surrogate_tpu.models.glow import MultiScaleCondGlow
    from pde_surrogate_tpu.utils.torch_import import (check_tree_match,
                                                      convert_glow_state_dict)

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.glow_msc as ref_glow

    torch.manual_seed(3)
    imsize, enc_blocks, flow_blocks = 16, [2, 2], [2, 2]
    tmodel = ref_glow.MultiScaleCondGlow(imsize, 1, 3, enc_blocks,
                                         flow_blocks, flow_coupling="dense",
                                         LUdecompose=True,
                                         train_sampling=True)
    x = torch.randn(2, 1, imsize, imsize)
    y = torch.rand(2, 3, imsize, imsize)
    tmodel.eval()
    with torch.no_grad():
        z_ref, logp_ref, _ = tmodel(y, x)
    z_ref, logp_ref = z_ref.numpy(), logp_ref.numpy()

    sd = {k: np.asarray(v.numpy()) for k, v in tmodel.state_dict().items()}
    params, batch_stats, constants = convert_glow_state_dict(sd)

    jmodel = MultiScaleCondGlow(img_size=imsize, x_channels=1, y_channels=3,
                                enc_blocks=enc_blocks,
                                flow_blocks=flow_blocks,
                                LU_decompose=True, train_sampling=True,
                                squeeze_order="reference")
    y_nhwc = np.moveaxis(y.numpy(), 1, -1)
    x_nhwc = np.moveaxis(x.numpy(), 1, -1)
    template = jmodel.init(jax.random.key(0), y_nhwc, x_nhwc, train=False)
    assert check_tree_match(params, template["params"]) == []
    assert check_tree_match(batch_stats, template["batch_stats"]) == []
    assert check_tree_match(constants, template["constants"]) == []

    z, logp, _ = jmodel.apply(
        {"params": params, "batch_stats": batch_stats,
         "constants": constants}, y_nhwc, x_nhwc, train=False)
    z = np.moveaxis(np.asarray(z), -1, 1)
    np.testing.assert_allclose(z, z_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logp), logp_ref, rtol=1e-4)


def test_glow_import_cli_roundtrip(tmp_path):
    """import_torch_ckpt --model glow -> post_cglow-compatible run dir:
    the restored checkpoint reproduces the torch forward through the
    args.txt-rebuilt model (squeeze_order='reference' round-trips)."""
    import jax
    import jax.numpy as jnp

    from pde_surrogate_tpu.cli.import_torch_ckpt import import_glow_ckpt
    from pde_surrogate_tpu.data.hdf5 import load_args
    from pde_surrogate_tpu.models.glow import MultiScaleCondGlow
    from pde_surrogate_tpu.train.checkpoint import restore_checkpoint
    from pde_surrogate_tpu.train.glow_trainer import create_glow_state

    if REF not in sys.path:
        sys.path.insert(0, REF)
    import models.glow_msc as ref_glow

    torch.manual_seed(4)
    imsize, enc_blocks, flow_blocks = 16, [2, 2], [2, 2]
    tmodel = ref_glow.MultiScaleCondGlow(imsize, 1, 3, enc_blocks,
                                         flow_blocks, LUdecompose=True)
    x = torch.randn(2, 1, imsize, imsize)
    y = torch.rand(2, 3, imsize, imsize)
    tmodel.eval()
    with torch.no_grad():
        z_ref, logp_ref, _ = tmodel(y, x)
    # the reference cGlow driver saves a full training dict
    # (train_cglow_reverse_kl.py:281-289)
    pth = tmp_path / "model_epoch9.pth"
    torch.save({"epoch": 9, "model": tmodel.state_dict(),
                "optimizer": {}, "logger": {}}, pth)

    run_dir = str(tmp_path / "imported_glow")
    import_glow_ckpt(str(pth), 9, run_dir, imsize=imsize,
                     enc_blocks=enc_blocks, flow_blocks=flow_blocks)
    ra = load_args(run_dir)
    assert ra.squeeze_order == "reference"

    model = MultiScaleCondGlow(img_size=ra.imsize, x_channels=ra.x_channels,
                               y_channels=ra.y_channels,
                               enc_blocks=ra.enc_blocks,
                               flow_blocks=ra.flow_blocks,
                               LU_decompose=ra.LU_decompose,
                               squeeze_order=ra.squeeze_order)
    y_nhwc = jnp.asarray(np.moveaxis(y.numpy(), 1, -1))
    x_nhwc = jnp.asarray(np.moveaxis(x.numpy(), 1, -1))
    state, _ = create_glow_state(model, jax.random.key(0), y_nhwc[:1],
                                 x_nhwc[:1], lr_max=1e-3, total_steps=1)
    state = restore_checkpoint(os.path.join(run_dir, "checkpoints"), 9, state)
    z, logp, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats,
         "constants": state.constants}, y_nhwc, x_nhwc, train=False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(z), -1, 1),
                               z_ref.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logp), logp_ref.numpy(), rtol=1e-4)


def test_import_cli_roundtrip(tmp_path):
    """import_torch_ckpt CLI -> predict_codec-compatible run dir."""
    import jax
    import jax.numpy as jnp

    from pde_surrogate_tpu.cli.import_torch_ckpt import import_codec_ckpt
    from pde_surrogate_tpu.data.hdf5 import load_args
    from pde_surrogate_tpu.models.codec import DenseED
    from pde_surrogate_tpu.train.checkpoint import restore_checkpoint
    from pde_surrogate_tpu.train.codec_trainer import create_state

    ref_codec = _ref_models()
    torch.manual_seed(2)
    blocks, imsize = [2, 3, 2], 16
    tmodel = ref_codec.DenseED(1, 3, imsize, blocks, growth_rate=4,
                               init_features=8)
    with torch.no_grad():
        y_ref = tmodel.eval()(torch.ones(1, 1, imsize, imsize)).numpy()
    pth = tmp_path / "model_epoch7.pth"
    torch.save(tmodel.state_dict(), pth)

    run_dir = str(tmp_path / "imported")
    import_codec_ckpt(str(pth), 7, run_dir, imsize=imsize, blocks=blocks,
                      growth_rate=4, init_features=8)
    ra = load_args(run_dir)
    assert ra.blocks == blocks and ra.imsize == imsize

    model = DenseED(1, 3, imsize=imsize, blocks=blocks, growth_rate=4,
                    init_features=8)
    state, _ = create_state(model, jax.random.key(0),
                            jnp.zeros((1, imsize, imsize, 1)), 1e-3, 1)
    state = restore_checkpoint(os.path.join(run_dir, "checkpoints"), 7, state)
    y = model.apply({"params": state.params,
                     "batch_stats": state.batch_stats},
                    np.ones((1, imsize, imsize, 1), np.float32), train=False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(y), -1, 1), y_ref,
                               rtol=2e-4, atol=2e-5)
