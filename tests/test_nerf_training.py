import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfnet_tpu.config import parse_args
from dfnet_tpu.data.synthetic import make_synthetic_scene
from dfnet_tpu.parallel.mesh import make_mesh
from dfnet_tpu.training.nerf_trainer import NeRFTrainer, exp_decayed_lr
from dfnet_tpu.training.checkpoints import save_pytree, load_pytree, latest_checkpoint


TINY = [
    "--netdepth", "2", "--netwidth", "32", "--netdepth_fine", "2",
    "--netwidth_fine", "32", "--N_samples", "12", "--N_importance", "12",
    "--N_rand", "256", "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
]


def make_trainer(tmp_path=None, mesh=None, extra=()):
    argv = TINY + list(extra)
    if tmp_path is not None:
        argv += ["--basedir", str(tmp_path), "--expname", "t"]
    cfg = parse_args(argv, stage="nerf")
    scene = make_synthetic_scene(n_train=6, n_val=2, H=16, W=16, seed=0)
    return NeRFTrainer(cfg, scene, mesh=mesh), scene


def test_lr_decay_formula():
    cfg = parse_args(["--lrate", "5e-4", "--lrate_decay", "2"], stage="nerf")
    assert exp_decayed_lr(cfg, 0) == pytest.approx(5e-4)
    assert exp_decayed_lr(cfg, 2000) == pytest.approx(5e-5)


def test_training_reduces_loss_and_improves_psnr():
    trainer, scene = make_trainer()
    early, late = [], []
    for e in range(15):
        loss, psnr = trainer.train_epoch(e)
        (early if e < 3 else late).append((loss, psnr))
    # compare window means — single-step values are stochastic
    early_loss = np.mean([l for l, _ in early])
    late_loss = np.mean([l for l, _ in late[-3:]])
    late_psnr = np.mean([p for _, p in late[-3:]])
    assert np.isfinite(late_loss)
    assert late_loss < early_loss
    assert late_psnr > np.mean([p for _, p in early])
    assert late_psnr > 10.0  # synthetic blob scene is easy


def test_render_split_psnr(tmp_path):
    trainer, scene = make_trainer(tmp_path)
    for e in range(10):
        trainer.train_epoch(e)
    psnr = trainer.render_split(scene.val, savedir=str(tmp_path / "renders"))
    assert psnr > 10.0
    assert (tmp_path / "renders" / "000.png").exists()


def test_checkpoint_roundtrip(tmp_path):
    trainer, scene = make_trainer(tmp_path)
    trainer.train_epoch(0)
    path = trainer.save(1)
    assert latest_checkpoint(str(tmp_path / "t")) == path

    trainer2, _ = make_trainer(tmp_path)
    start = trainer2.try_resume()
    assert start == trainer.global_step
    a = jax.tree.leaves(trainer.params)
    b = jax.tree.leaves(trainer2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # resumed trainer can keep stepping
    loss, psnr = trainer2.train_epoch(1)
    assert np.isfinite(loss)


def test_pytree_io_none_and_tuples(tmp_path):
    tree = {"a": np.arange(3), "b": (np.ones(2), None, {"c": np.zeros(1)})}
    p = str(tmp_path / "x.npz")
    save_pytree(p, tree, step=7)
    back, scalars = load_pytree(p)
    assert int(scalars["step"]) == 7
    np.testing.assert_array_equal(back["a"], np.arange(3))
    assert back["b"][1] is None
    np.testing.assert_array_equal(back["b"][0], np.ones(2))


def test_sharded_train_step_runs_on_mesh():
    mesh = make_mesh(8)
    trainer, scene = make_trainer(mesh=mesh)
    loss, psnr = trainer.train_epoch(0)
    assert np.isfinite(loss) and np.isfinite(psnr)
    # same init without mesh gives the same first-epoch loss trajectory
    trainer2, _ = make_trainer(mesh=None)
    np.random.seed(0)
    trainer.global_step = 0
    # (not bitwise comparable due to reduction orders; just sanity range)
    loss2, _ = trainer2.train_epoch(0)
    assert abs(loss - loss2) < max(1.0, 0.5 * loss2 + 0.5)


def test_vanilla_nerf_mode_trains():
    """Non-NeRFH mode: vanilla NeRF pair + original compositing."""
    cfg = parse_args([
        "--netdepth", "2", "--netwidth", "32", "--netdepth_fine", "2",
        "--netwidth_fine", "32", "--N_samples", "10", "--N_importance", "10",
        "--N_rand", "200", "--dataset_type", "synthetic",
    ], stage="nerf")
    assert not cfg.NeRFH
    scene = make_synthetic_scene(n_train=5, n_val=2, H=16, W=16, seed=1)
    trainer = NeRFTrainer(cfg, scene)
    from dfnet_tpu.render.volume import VanillaNeRFModel
    assert isinstance(trainer.model, VanillaNeRFModel)
    l0, p0 = trainer.train_epoch(0)
    for e in range(1, 12):
        loss, psnr = trainer.train_epoch(e)
    assert loss < l0 and psnr > p0
    val = trainer.render_split(scene.val)
    assert val > 8.0


def test_dnerf_windowed_embedding_training():
    """reduce_embedding=2 threads the epoch into the windowed embedder."""
    cfg = parse_args(TINY + ["--reduce_embedding", "2", "--epochToMaxFreq", "5"],
                     stage="nerf")
    scene = make_synthetic_scene(n_train=4, n_val=2, H=16, W=16, seed=2)
    trainer = NeRFTrainer(cfg, scene)
    assert trainer.model.embed_xyz.windowed
    l0, _ = trainer.train_epoch(0)
    l1, _ = trainer.train_epoch(6)  # past epochToMaxFreq → fully open window
    assert np.isfinite(l0) and np.isfinite(l1)
    psnr = trainer.render_split(scene.val)
    assert np.isfinite(psnr)


def test_render_factor_preview():
    cfg = parse_args(TINY + ["--render_factor", "2"], stage="nerf")
    scene = make_synthetic_scene(n_train=3, n_val=2, H=16, W=16, seed=3)
    trainer = NeRFTrainer(cfg, scene)
    trainer.train_epoch(0)
    psnr = trainer.render_split(scene.val)
    assert np.isfinite(psnr)
    out = trainer._render(trainer.params,
                          __import__("jax.numpy", fromlist=["x"]).asarray(scene.val.poses[0]),
                          __import__("jax.numpy", fromlist=["x"]).asarray(scene.val.hists[0]),
                          __import__("jax.numpy", fromlist=["x"]).float32(0))
    assert out["rgb"].shape == (8, 8, 3)


def test_render_image_sharded_matches_single():
    """SPMD full-image render over an 8-device mesh equals the
    single-device path."""
    import jax.numpy as jnp

    from dfnet_tpu.models.factory import create_nerfh, render_settings
    from dfnet_tpu.parallel.mesh import make_mesh
    from dfnet_tpu.render.volume import render_image, render_image_sharded

    cfg = parse_args([
        "--netdepth", "2", "--netwidth", "16", "--netdepth_fine", "2",
        "--netwidth_fine", "16", "--N_samples", "6", "--N_importance", "6",
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
    ], stage="nerf")
    model, params = create_nerfh(cfg, jax.random.PRNGKey(0))
    st = render_settings(cfg, 0.3, 3.0, test=True)
    H, W, f = 12, 16, 14.0
    c2w = jnp.eye(4)[:3]
    hist = jnp.zeros((10,), jnp.int32)

    single = render_image(params, model, c2w, hist, H, W, f, st, chunk=16)
    mesh = make_mesh(8)
    sharded = jax.jit(
        lambda p: render_image_sharded(p, model, c2w, hist, H, W, f, st,
                                       mesh, chunk=8))(params)
    np.testing.assert_allclose(np.asarray(sharded["rgb"]),
                               np.asarray(single["rgb"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sharded["acc"]),
                               np.asarray(single["acc"]), atol=1e-4)
