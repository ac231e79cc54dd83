import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfnet_tpu.config import parse_args
from dfnet_tpu.data.synthetic import make_synthetic_scene
from dfnet_tpu.training.callbacks import EarlyStopping, ReduceLROnPlateau
from dfnet_tpu.training.feature_losses import (
    cosine_feature_loss, pose_loss, triplet_loss,
    triplet_loss_hard_negative_mining, triplet_loss_hard_negative_mining_plus,
)
from dfnet_tpu.training.feature_trainer import FeatureTrainer
from dfnet_tpu.training.nerf_renderer import FrozenNeRF


# 48x64 images: VGG16's five 2x2 pools need >=32 on each side
SCENE = make_synthetic_scene(n_train=8, n_val=4, H=48, W=64, focal=60.0, seed=0)

NERF_TINY = [
    "--netdepth", "2", "--netwidth", "16", "--netdepth_fine", "2",
    "--netwidth_fine", "16", "--N_samples", "6", "--N_importance", "6",
    "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
    "--tinyimg", "--tinyscale", "4",
]


def make_nerf(cfg_extra=()):
    cfg = parse_args(NERF_TINY + list(cfg_extra), stage="nerf")
    return FrozenNeRF(cfg, SCENE.hwf, SCENE.near, SCENE.far, SCENE.world_setup)


def feature_cfg(tmp_path, extra=()):
    return parse_args(NERF_TINY + [
        "--DFNet", "--featurenet_batch_size", "2", "--tripletloss",
        "--basedir", str(tmp_path), "--expname", "nerfh",
        "--model_name", "dfnet",
    ] + list(extra), stage="feature")


# ------------------------------------------------------------------ losses

def test_triplet_losses_zero_when_identical_marginless():
    f = jnp.ones((1, 4, 8, 8, 16))
    g = f + 0.0
    # identical features: d(a,p)=~0, d(a,n)=~0 → loss = margin
    assert float(triplet_loss(f, g, margin=0.5)) == pytest.approx(0.5, abs=1e-5)


def test_triplet_losses_separate_batches():
    rng = np.random.default_rng(0)
    base = rng.normal(size=(1, 4, 6, 6, 8)).astype(np.float32)
    f1 = jnp.asarray(base)
    f2 = jnp.asarray(base + 0.01 * rng.normal(size=base.shape).astype(np.float32))
    # positive is near, rolled negative is far → loss < margin
    for fn in (triplet_loss, triplet_loss_hard_negative_mining,
               triplet_loss_hard_negative_mining_plus):
        val = float(fn(f1, f2, margin=1.0))
        assert 0.0 <= val < 1.0, fn.__name__


def test_triplet_ref_axis_matches_torch():
    """Reference-exact axis (--triplet_ref_axis): our triplet over NHWC
    features with axis=-2 must equal torch.nn.TripletMarginLoss over the
    reference's (L,B,C,H,W) layout (misc.py:355-435 uses the default
    last-axis reduction = W)."""
    import torch

    rng = np.random.default_rng(3)
    nhwc = rng.normal(size=(2, 4, 6, 5, 8)).astype(np.float32)  # (L,B,H,W,C)
    nhwc2 = rng.normal(size=nhwc.shape).astype(np.float32)
    # reference layout (L,B,C,H,W)
    a_t = torch.tensor(nhwc.transpose(0, 1, 4, 2, 3))
    p_t = torch.tensor(nhwc2.transpose(0, 1, 4, 2, 3))
    n_t = torch.roll(p_t, 1, dims=1)
    ref = torch.nn.TripletMarginLoss(margin=1.0)(a_t, p_t, n_t)
    ours = triplet_loss(jnp.asarray(nhwc), jnp.asarray(nhwc2), margin=1.0,
                        axis=-2)
    assert float(ours) == pytest.approx(float(ref), abs=2e-5)
    # and the hard-negative-mining-plus wrapper threads the axis through
    ours_plus = triplet_loss_hard_negative_mining_plus(
        jnp.asarray(nhwc), jnp.asarray(nhwc2), margin=1.0, axis=-2)
    assert np.isfinite(float(ours_plus))


def test_cosine_feature_loss_bounds():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    assert float(cosine_feature_loss(a, a)) == pytest.approx(0.0, abs=1e-5)
    assert float(cosine_feature_loss(a, -a)) == pytest.approx(2.0, abs=1e-5)


def test_pose_loss():
    a = jnp.zeros((2, 12))
    b = jnp.ones((2, 12)) * 2.0
    assert float(pose_loss(a, b)) == pytest.approx(4.0)


# ------------------------------------------------------------------ callbacks

def test_early_stopping_saves_best_and_stops(tmp_path):
    es = EarlyStopping(str(tmp_path), patience=2)
    params = {"w": np.ones(3)}
    es(1.0, params, epoch=0, save_multiple=True)
    assert es.is_best_model()
    es(2.0, params, epoch=1, save_multiple=True)   # worse
    es(3.0, params, epoch=2, save_multiple=True)   # worse → stop
    assert es.early_stop
    assert (tmp_path / "checkpoint-0000-1.0000.npz").exists()


def test_early_stopping_psnr_mode(tmp_path):
    es = EarlyStopping(str(tmp_path), patience=5, val_on_psnr=True)
    es(0.0, {"w": np.ones(1)}, epoch=0, val_psnr=15.0)
    es(0.0, {"w": np.ones(1)}, epoch=1, val_psnr=17.0)   # better
    assert es.best_score == 17.0 and es.counter == 0


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=1)
    assert s.step(1.0) == 1.0
    assert s.step(1.0) == 1.0   # bad 1
    assert s.step(1.0) == 0.5   # bad 2 > patience → cut
    assert s.step(0.4) == 0.5   # improvement resets


# ------------------------------------------------------------------ frozen NeRF

def test_frozen_nerf_render_shapes():
    nerf = make_nerf()
    rgb = nerf.render_at_pose(SCENE.train.poses[0], SCENE.train.hists[0])
    assert rgb.shape == (48, 64, 3)
    views = nerf.prerender_views(SCENE.train.poses[:2], SCENE.train.hists[:2],
                                 log_every=0)
    assert views.shape == (2, 48, 64, 3)
    assert np.isfinite(views).all()


# ------------------------------------------------------------------ stage-2 e2e

def test_feature_trainer_end_to_end(tmp_path):
    cfg = feature_cfg(tmp_path, ["--random_view_synthesis", "--rvs_refresh_rate", "5",
                                 "--rvs_trans", "0.1", "--rvs_rotation", "5",
                                 "--d_max", "0.2"])
    nerf = make_nerf()
    trainer = FeatureTrainer(cfg, SCENE, nerf)
    targets = SCENE.train.images
    rgbs = trainer.prerender_train_views()
    rng = np.random.default_rng(0)
    poses_perturb, virtue_view = trainer.rvs_refresh(rng)
    assert virtue_view.shape == targets.shape

    l0 = trainer.train_epoch(targets, rgbs, virtue_view, poses_perturb, rng)
    losses = [l0]
    for _ in range(3):
        losses.append(trainer.train_epoch(targets, rgbs, virtue_view,
                                          poses_perturb, rng))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learning something

    val = trainer.validate()
    assert np.isfinite(val)
    median, mean = trainer.eval_median_error()
    assert median.shape == (2,) and np.isfinite(median).all()

    # checkpoint via EarlyStopping and reload
    trainer.early_stopping(val, trainer.checkpoint_tree(), epoch=0,
                           save_multiple=False)
    ckpt = tmp_path / "dfnet" / "checkpoint.npz"
    assert ckpt.exists()
    trainer2 = FeatureTrainer(cfg.replace(pretrain_model_path=str(ckpt)),
                              SCENE, nerf)
    a = jax.tree.leaves(trainer.params)
    b = jax.tree.leaves(trainer2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_feature_trainer_no_rvs_freezebn(tmp_path):
    cfg = feature_cfg(tmp_path, ["--freezeBN"])
    nerf = make_nerf()
    trainer = FeatureTrainer(cfg, SCENE, nerf)
    bn_before = np.asarray(trainer.params["adapt"]["0"]["bn_scale"])
    rgbs = trainer.prerender_train_views()
    rng = np.random.default_rng(0)
    loss = trainer.train_epoch(SCENE.train.images, rgbs, None, None, rng)
    assert np.isfinite(loss)
    # frozen BN scale unchanged by the update
    np.testing.assert_array_equal(
        bn_before, np.asarray(trainer.params["adapt"]["0"]["bn_scale"]))


def test_feature_trainer_mesh_sharded(tmp_path):
    from dfnet_tpu.parallel.mesh import make_mesh

    cfg = feature_cfg(tmp_path, ["--featurenet_batch_size", "4"])
    nerf = make_nerf()
    trainer = FeatureTrainer(cfg, SCENE, nerf, mesh=make_mesh(4))
    rgbs = trainer.prerender_train_views()
    rng = np.random.default_rng(0)
    loss = trainer.train_epoch(SCENE.train.images, rgbs, None, None, rng)
    assert np.isfinite(loss)


def test_dfnet_s_variant_end_to_end(tmp_path):
    """DFNet_s (conv1_2-only) trains through the stage-2 loop."""
    cfg = feature_cfg(tmp_path, ["--DFNet_s"])
    nerf = make_nerf()
    trainer = FeatureTrainer(cfg, SCENE, nerf)
    assert trainer.model_cfg.hypercolumn_layers == ("conv1_2",)
    rgbs = trainer.prerender_train_views()
    rng = np.random.default_rng(0)
    loss = trainer.train_epoch(SCENE.train.images, rgbs, None, None, rng)
    assert np.isfinite(loss)
    median, _ = trainer.eval_median_error()
    assert np.isfinite(median).all()


# ------------------------------------------------------------------ batching

def test_epoch_batches_cover_every_image():
    """drop_last=False parity (reference run_feature.py:389): with
    n % b != 0 the tail still trains — every image appears each epoch."""
    rng = np.random.default_rng(0)
    for n, b in ((5, 2), (7, 4), (3, 8), (8, 4)):
        batches = FeatureTrainer.epoch_batches(n, b, np.random.default_rng(1))
        assert all(len(x) == b for x in batches)
        assert len(batches) == -(-n // b) or (n < b and len(batches) == 1)
        seen = set(int(i) for x in batches for i in x)
        assert seen == set(range(n)), (n, b, seen)


def test_prefetch_epoch_matches_sync(tmp_path):
    """cfg.prefetch routes batches through the double-buffered host→HBM
    iterator; the training result must be identical to the sync path."""
    def run(prefetch):
        cfg = feature_cfg(tmp_path, extra=["--prefetch", str(prefetch),
                                           "--featurenet_batch_size", "3"])
        tr = FeatureTrainer(cfg, SCENE, nerf=None, rng=jax.random.PRNGKey(7))
        loss = tr.train_epoch(SCENE.train.images, SCENE.train.images,
                              None, None, np.random.default_rng(3))
        return loss, tr.params

    loss_sync, p_sync = run(0)
    loss_pre, p_pre = run(2)
    assert loss_pre == pytest.approx(loss_sync, rel=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
                 p_sync, p_pre)


def test_poselossonly_trains_pose_branch_only(tmp_path):
    """Legacy train_posenet parity (reference dm/pose_model.py:326-391):
    pose-only training is a plain MSE-on-pose loop — the feature
    (adapt) branch must receive zero gradient and stay untouched, and
    the pose loss must fall."""
    cfg = feature_cfg(tmp_path, ["--poselossonly"])
    trainer = FeatureTrainer(cfg, SCENE, nerf=None)
    adapt_before = jax.tree.map(np.asarray, trainer.params["adapt"])
    rng = np.random.default_rng(0)
    targets = SCENE.train.images
    l0 = trainer.train_epoch(targets, targets, None, None, rng)
    for _ in range(3):
        l1 = trainer.train_epoch(targets, targets, None, None, rng)
    assert np.isfinite([l0, l1]).all()
    assert l1 < l0
    # adam with exactly-zero grads produces exactly-zero updates
    jax.tree.map(np.testing.assert_array_equal,
                 adapt_before, jax.tree.map(np.asarray, trainer.params["adapt"]))


def test_featurelossonly_leaves_pose_head_alone(tmp_path):
    """--featurelossonly is the dual: only the feature branch trains;
    the pose head (fc_pose) must be untouched."""
    cfg = feature_cfg(tmp_path, ["--featurelossonly"])
    trainer = FeatureTrainer(cfg, SCENE, nerf=None)
    fc_before = np.asarray(trainer.params["fc_pose"]["w"])
    rng = np.random.default_rng(0)
    targets = SCENE.train.images
    loss = trainer.train_epoch(targets, targets + 0.05, None, None, rng)
    assert np.isfinite(loss)
    np.testing.assert_array_equal(fc_before,
                                  np.asarray(trainer.params["fc_pose"]["w"]))
