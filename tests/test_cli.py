"""Entry-point smoke tests: the three CLIs run end-to-end on the
synthetic scene with tiny models (in-process, CPU mesh)."""

import os
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

TINY = [
    "--dataset_type", "synthetic", "--NeRFH", "--encode_hist",
    "--netdepth", "2", "--netwidth", "16", "--netdepth_fine", "2",
    "--netwidth_fine", "16", "--N_samples", "6", "--N_importance", "6",
    "--N_rand", "64",
]


def test_run_nerf_cli(tmp_path):
    import run_nerf

    argv = TINY + ["--basedir", str(tmp_path), "--expname", "nerfh",
                   "--epochs", "2", "--i_weights", "2", "--i_testset", "1000"]
    run_nerf.train(argv)
    assert (tmp_path / "nerfh" / "000002.npz").exists()
    assert (tmp_path / "nerfh" / "args.txt").exists()

    # eval path reuses the checkpoint
    psnr = run_nerf.train(argv + ["--render_test"])
    assert psnr is not None and np.isfinite(psnr)
    assert (tmp_path / "nerfh" / "evaluate_val_test_000003" / "000.png").exists()


def test_run_feature_cli(tmp_path):
    import run_nerf
    import run_feature

    argv = TINY + ["--basedir", str(tmp_path), "--expname", "nerfh",
                   "--epochs", "1", "--i_weights", "1", "--i_testset", "1000"]
    run_nerf.train(argv)

    feat_argv = TINY + [
        "--basedir", str(tmp_path), "--expname", "nerfh",
        "--model_name", "dfnet", "--DFNet", "--featurenet_batch_size", "2",
        "--epochs", "1", "--i_eval", "1000", "--tinyimg",
    ]
    run_feature.train(feat_argv)
    assert (tmp_path / "dfnet" / "checkpoint-0000-0.0000.npz").exists() or \
        list((tmp_path / "dfnet").glob("checkpoint*.npz"))


def test_train_cli_and_eval(tmp_path):
    import run_nerf
    import train as train_cli

    argv = TINY + ["--basedir", str(tmp_path), "--expname", "nerfh",
                   "--epochs", "1", "--i_weights", "1", "--i_testset", "1000"]
    run_nerf.train(argv)

    # make a DFNet checkpoint without full stage-2 training
    from dfnet_tpu.config import parse_args
    from dfnet_tpu.data.loader import load_scene
    from dfnet_tpu.training.feature_trainer import FeatureTrainer

    fcfg = parse_args(TINY + ["--basedir", str(tmp_path), "--model_name",
                              "dfnet", "--DFNet"], stage="feature")
    scene = load_scene(fcfg, stage="apr")
    ft = FeatureTrainer(fcfg, scene, nerf=None)
    ft.early_stopping(1.0, ft.checkpoint_tree(), epoch=0, save_multiple=False)
    ckpt = str(tmp_path / "dfnet" / "checkpoint.npz")

    dm_argv = TINY + [
        "--basedir", str(tmp_path), "--expname", "nerfh",
        "--model_name", "dfnetdm", "--DFNet", "--combine_loss",
        "--pretrain_model_path", ckpt, "--epochs", "0", "--i_eval", "1000",
        "--val_on_psnr",
    ]
    train_cli.train(dm_argv)
    assert list((tmp_path / "dfnetdm").glob("checkpoint*.npz"))

    # eval mode
    train_cli.evaluate(dm_argv + ["--eval"])


def test_run_nerf_video_and_spiral(tmp_path):
    import run_nerf

    argv = TINY + ["--basedir", str(tmp_path), "--expname", "nerfh",
                   "--epochs", "1", "--i_weights", "1", "--i_testset", "1000"]
    run_nerf.train(argv)
    run_nerf.train(argv + ["--render_test", "--render_video_test"])
    vids = list((tmp_path / "nerfh").glob("nerfh_test_*_test_rgb.*"))
    assert vids, "expected a rendered video file"
    run_nerf.train(argv + ["--render_pose_only"])
    spirals = list((tmp_path / "nerfh").glob("spiral_*.*"))
    assert spirals


def test_mesh_shape_cli_equivalence(tmp_path):
    """--mesh_shape 8 (SPMD over the CPU mesh) trains to the same losses
    as the unsharded run — the CLI-reachable DataParallel replacement
    (reference: script/models/nerfw.py:399-400)."""
    import json

    import run_nerf

    def run(expname, extra):
        np.random.seed(0)
        argv = TINY + ["--basedir", str(tmp_path), "--expname", expname,
                       "--epochs", "2", "--i_weights", "1000",
                       "--i_testset", "1000", "--rng_seed", "3"] + extra
        run_nerf.train(argv)
        with open(tmp_path / expname / "metrics.jsonl") as fh:
            return [json.loads(l)["loss"] for l in fh if l.strip()]

    losses_single = run("nerfh_single", [])
    losses_mesh = run("nerfh_mesh", ["--mesh_shape", "8"])
    assert len(losses_mesh) == len(losses_single) > 0
    np.testing.assert_allclose(losses_mesh, losses_single, rtol=1e-3)


def test_make_mesh_refuses_oversubscription():
    import jax
    import pytest as _pytest

    from dfnet_tpu.parallel.mesh import make_mesh, mesh_from_config

    n = len(jax.devices())
    with _pytest.raises(ValueError):
        make_mesh(n + 1)

    from dfnet_tpu.config import Config

    assert mesh_from_config(Config(mesh_shape=None)) is None
    assert mesh_from_config(Config(mesh_shape=1)) is None
    assert mesh_from_config(Config(mesh_shape=0)).devices.size == n
    assert mesh_from_config(Config(mesh_shape=n)).devices.size == n


def test_check_numerics_flag(tmp_path, monkeypatch):
    """--check_numerics turns on the NaN/Inf failure detector (and a run
    with healthy numerics still completes)."""
    import jax

    import run_nerf

    argv = TINY + ["--basedir", str(tmp_path), "--expname", "nerfh",
                   "--epochs", "1", "--i_weights", "1000",
                   "--i_testset", "1000", "--check_numerics"]
    try:
        run_nerf.train(argv)
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)


def test_help_exits_cleanly(capsys):
    """-h/--help prints every flag with stage defaults and exits 0
    (the reference's configargparse auto-help surface)."""
    from dfnet_tpu.config import parse_args

    with pytest.raises(SystemExit) as e:
        parse_args(["--help"], stage="feature")
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "--tripletloss" in out and "--train_cull_q" in out
    # stage overlay reflected in the printed default
    assert "dfnet-feature" in out


def test_cli_shims_reexport_package_entry_points():
    """The repo-root scripts are thin shims over dfnet_tpu.cli (which
    pyproject installs as dfnet-nerf/dfnet-feature/dfnet-dm)."""
    import run_feature
    import run_nerf
    import train as train_cli

    from dfnet_tpu.cli import dm, feature, nerf

    assert run_nerf.train is nerf.train and run_nerf.main is nerf.main
    assert run_feature.train is feature.train
    assert run_feature.render_features is feature.render_features
    assert train_cli.train is dm.train and train_cli.evaluate is dm.evaluate
    assert callable(dm.main)
