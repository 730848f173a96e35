"""Dataset-factory CLI smoke: files in the reference layout."""

import h5py
import numpy as np


def test_make_dataset_grf(tmp_path):
    from pde_surrogate_tpu.cli.make_dataset import main
    main(["--data-dir", str(tmp_path), "--imsize", "16", "--kle", "32",
          "--ntrain", "8", "--nval", "4", "--ntest", "4",
          "--n-monte-carlo", "4", "--solve-batch", "4"])
    d = tmp_path / "16x16"
    assert (d / "kle32_lhs8_train.hdf5").exists()
    with h5py.File(d / "kle32_lhs4_val.hdf5") as f:
        assert f["input"].shape == (4, 1, 16, 16)
        assert f["output"].shape == (4, 3, 16, 16)
        u = f["output"][:, 0]
        np.testing.assert_allclose(u[:, :, 0], 1.0, atol=1e-5)
    # train split has inputs only by default (label-free training)
    with h5py.File(d / "kle32_lhs8_train.hdf5") as f:
        assert "output" not in f
    # idempotent: second call skips
    main(["--data-dir", str(tmp_path), "--imsize", "16", "--kle", "32",
          "--ntrain", "8", "--nval", "4", "--ntest", "4",
          "--n-monte-carlo", "4", "--solve-batch", "4"])


def test_make_dataset_channelized_matches_lazy_path(tmp_path):
    """The explicit factory and the drivers' lazy ensure_dataset must write
    byte-identical channelized files for the same names (regression: the
    factory used seeds 11_000/31_000 vs the lazy paths' 10_000/20_000)."""
    from pde_surrogate_tpu.cli._codec_common import ensure_dataset
    from pde_surrogate_tpu.cli.make_dataset import main
    main(["--data-dir", str(tmp_path / "a"), "--imsize", "16",
          "--family", "channelized", "--ntrain", "4", "--ntest", "4",
          "--solve-batch", "4"])
    lazy = tmp_path / "b" / "channel_ng16_n4_test.hdf5"
    lazy.parent.mkdir(parents=True)
    ensure_dataset(str(lazy), "channelized", 4, 16, 0, seed=20_000,
                   with_output=True, solve_batch=4)
    with h5py.File(tmp_path / "a" / "16x16" / "channel_ng16_n4_test.hdf5") as fa, \
            h5py.File(lazy) as fb:
        np.testing.assert_array_equal(fa["input"][:], fb["input"][:])
        np.testing.assert_array_equal(fa["output"][:], fb["output"][:])


def test_uq_dataset_files_family_resolution(tmp_path):
    """post_cglow's family-aware MC/val resolution (round 4): channelized
    run args get channelized MC + test sets; the MC design uses its own
    seed stream (40_000 + kle) so it never aliases the val design."""
    from types import SimpleNamespace
    from pde_surrogate_tpu.cli._codec_common import uq_dataset_files
    run_args = SimpleNamespace(data="channelized", data_dir=str(tmp_path),
                               imsize=16, kle=0)
    mc, test = uq_dataset_files(run_args, n_mc=2, ntest=2)
    assert mc.endswith("channel_ng64_n10000_mc.hdf5")
    assert test.endswith("channel_ng64_n512_test.hdf5")
    with h5py.File(mc) as fm, h5py.File(test) as ft:
        assert fm["output"].shape == (2, 3, 16, 16)
        assert not np.array_equal(fm["input"][:], ft["input"][:])
    # pre---data run args (no .data attr) resolve to the GRF family
    legacy = SimpleNamespace(data_dir=str(tmp_path), imsize=16, kle=32)
    mc2, test2 = uq_dataset_files(legacy, n_mc=2, ntest=2)
    assert mc2.endswith("kle32_lhs10000_monte_carlo.hdf5")
    assert test2.endswith("kle32_lhs1000_val.hdf5")


def test_make_dataset_warped(tmp_path):
    from pde_surrogate_tpu.cli.make_dataset import main
    main(["--data-dir", str(tmp_path), "--imsize", "16",
          "--family", "warped_grf", "--ntest", "4", "--solve-batch", "4"])
    assert (tmp_path / "16x16" / "warped_gp_ng16_n4.hdf5").exists()


def test_ensure_dataset_attaches_labels_in_place(tmp_path):
    """An inputs-only file later needed WITH labels gets FV labels solved
    for its existing inputs (design-preserving augmentation — round 5:
    the supervised-MLE control at a size whose train set was generated
    label-free for fvcg training); the inputs must be byte-identical."""
    from pde_surrogate_tpu.cli._codec_common import ensure_dataset
    p = str(tmp_path / "16x16" / "kle32_lhs8_train.hdf5")
    ensure_dataset(p, "grf", 8, 16, 32, seed=10_032, with_output=False)
    with h5py.File(p) as f:
        k_before = f["input"][()]
        assert "output" not in f
    ensure_dataset(p, "grf", 8, 16, 32, seed=10_032, with_output=True)
    with h5py.File(p) as f:
        np.testing.assert_array_equal(f["input"][()], k_before)
        assert f["output"].shape == (8, 3, 16, 16)
        u = f["output"][:, 0]
        np.testing.assert_allclose(u[:, :, 0], 1.0, atol=1e-5)
