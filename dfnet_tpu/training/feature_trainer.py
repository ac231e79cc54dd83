"""Stage 2 — DFNet training with Random View Synthesis (run_feature
equivalent).

Reference behavior (/root/reference/script/run_feature.py:102-422):
  - pre-render every train view once through the frozen NeRF
    (render_nerfw_imgs);
  - every rvs_refresh_rate epochs, perturb each train pose
    (rot ±rvs_rotation deg, trans ±rvs_trans, bbox-clamped to the train
    camera volume ±d_max) and render the virtual views;
  - per batch: siamese DFNet on [GT images; NeRF renders] → pose MSE on
    doubled GT poses + triplet feature loss (hard-negative-mining-plus)
    + pose MSE of the RVS views, weighted by combine_loss_w;
  - val pose-MSE per epoch → ReduceLROnPlateau + EarlyStopping;
  - median pose error (get_error_in_q) every i_eval epochs.

TPU-first: the whole siamese forward+backward+Adam update is one jitted
step over an NHWC image batch; BN runs in batch-stat mode unless
freezeBN (then eval-mode stats + masked-out scale/bias updates).
"""

from __future__ import annotations

import os.path as osp
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dfnet_tpu.config import Config
from dfnet_tpu.data.scene import SceneData
from dfnet_tpu.models.dfnet import DFNetConfig, dfnet_forward, init_dfnet_params
from dfnet_tpu.pose import perturb_single_render_pose
from dfnet_tpu.training.callbacks import EarlyStopping, ReduceLROnPlateau
from dfnet_tpu.training.checkpoints import load_pytree
from dfnet_tpu.training.eval_pose import get_error_in_q
from dfnet_tpu.training.feature_losses import (
    feature_mse,
    pose_loss,
    triplet_loss_hard_negative_mining_plus,
)
from dfnet_tpu.training.nerf_renderer import FrozenNeRF


def load_dfnet_params(path: str, cfg_model: DFNetConfig, key=None):
    """Load DFNet weights from ours (.npz) or the reference (.pt)."""
    if path.endswith(".pt"):
        from dfnet_tpu.convert import convert_dfnet_checkpoint

        params, state = convert_dfnet_checkpoint(path)
    else:
        tree, _ = load_pytree(path)
        params, state = tree["params"], tree["state"]
    return (jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, state))


class FeatureTrainer:
    def __init__(self, cfg: Config, scene: SceneData, nerf: Optional[FrozenNeRF],
                 rng: Optional[jax.Array] = None, mesh=None):
        self.cfg = cfg
        self.scene = scene
        self.nerf = nerf
        self.mesh = mesh
        self.model_cfg = DFNetConfig.small() if cfg.DFNet_s else DFNetConfig()
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.rng_seed)
        self.rng, key = jax.random.split(rng)
        self.params, self.state = init_dfnet_params(key, self.model_cfg)
        if cfg.vgg_init_path:
            from dfnet_tpu.convert import convert_vgg16_imagenet

            self.params["encoder"] = jax.tree.map(
                jnp.asarray, convert_vgg16_imagenet(cfg.vgg_init_path))
            print(f"[dfnet] ImageNet VGG16 init from {cfg.vgg_init_path}")
        if cfg.pretrain_model_path:
            self.params, self.state = load_dfnet_params(
                cfg.pretrain_model_path, self.model_cfg)
            print(f"[dfnet] loaded pretrained {cfg.pretrain_model_path}")

        self.optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.learning_rate)
        self.opt_state = self.optimizer.init(self.params)
        self.scheduler = ReduceLROnPlateau(
            cfg.learning_rate, factor=0.95, patience=cfg.patience[1])
        self.early_stopping = EarlyStopping(
            osp.join(cfg.basedir, cfg.model_name or "dfnet"),
            patience=cfg.patience[0], val_on_psnr=cfg.val_on_psnr)
        self._build()

    # ------------------------------------------------------------- jit fns
    def _build(self):
        cfg, mcfg = self.cfg, self.model_cfg
        H, W = self.scene.H, self.scene.W
        train_bn = not cfg.freezeBN
        w = cfg.combine_loss_w
        use_triplet = cfg.tripletloss
        # reference-exact triplet axis (the reference reduces the
        # pairwise distance over its last = image-W axis): auto-on when
        # fine-tuning a .pt-ported released checkpoint, else per-pixel C
        triplet_ref = cfg.triplet_ref_axis
        if triplet_ref is None:
            triplet_ref = bool(cfg.pretrain_model_path
                               and cfg.pretrain_model_path.endswith(".pt"))
        triplet_axis = -2 if triplet_ref else -1
        use_rvs = cfg.random_view_synthesis
        cdt = jnp.bfloat16 if cfg.feature_precision == "bf16" else jnp.float32
        optimizer = self.optimizer
        shard = None
        if self.mesh is not None:
            from dfnet_tpu.parallel.mesh import data_sharding

            shard = data_sharding(self.mesh)

        def siamese_losses(params, state, targets, rgbs, poses12):
            if shard is not None:
                # data-parallel over the image batch: XLA all-reduces
                # grads over ICI (the DataParallel replacement)
                targets = jax.lax.with_sharding_constraint(targets, shard)
                rgbs = jax.lax.with_sharding_constraint(rgbs, shard)
            x = jnp.concatenate([targets, rgbs], 0)
            feats, predict, new_state = dfnet_forward(
                params, state, x, mcfg, return_feature=True,
                is_single_stream=False, upsample_h=H, upsample_w=W,
                train_bn=train_bn, compute_dtype=cdt)
            f_t, f_r = feats
            pose_gt = jnp.concatenate([poses12, poses12], 0)
            loss_pose = pose_loss(predict, pose_gt)
            if use_triplet:
                loss_f = triplet_loss_hard_negative_mining_plus(
                    f_r, f_t, margin=cfg.triplet_margin, axis=triplet_axis)
            else:
                loss_f = feature_mse(f_r, f_t)
            return loss_pose, loss_f, new_state

        def loss_fn(params, state, targets, rgbs, poses12,
                    rgb_perturb, pose_perturb12):
            if use_rvs:
                # RVS views ride the SAME encoder dispatch as the siamese
                # pair (one 3B conv batch instead of 2B + a separate B
                # forward — the reference's extra model call,
                # run_feature.py:219-227, is dispatch-bound on TPU).
                # feature_count=2B keeps adapt/BN statistics identical
                # to the two-call form; pose head is per-image.
                nb = targets.shape[0]
                if shard is not None:
                    targets = jax.lax.with_sharding_constraint(targets, shard)
                    rgbs = jax.lax.with_sharding_constraint(rgbs, shard)
                    rgb_perturb = jax.lax.with_sharding_constraint(
                        rgb_perturb, shard)
                x = jnp.concatenate([targets, rgbs, rgb_perturb], 0)
                feats, predict, new_state = dfnet_forward(
                    params, state, x, mcfg, return_feature=True,
                    is_single_stream=False, feature_count=2 * nb,
                    upsample_h=H, upsample_w=W, train_bn=train_bn,
                    compute_dtype=cdt)
                f_t, f_r = feats
                pose_gt = jnp.concatenate([poses12, poses12], 0)
                loss_pose = pose_loss(predict[:2 * nb], pose_gt)
                if use_triplet:
                    loss_f = triplet_loss_hard_negative_mining_plus(
                        f_r, f_t, margin=cfg.triplet_margin,
                        axis=triplet_axis)
                else:
                    loss_f = feature_mse(f_r, f_t)
                loss_rvs = pose_loss(predict[2 * nb:], pose_perturb12)
                loss = w[0] * loss_pose + w[1] * loss_f + w[2] * loss_rvs
                return loss, new_state
            loss_pose, loss_f, new_state = siamese_losses(
                params, state, targets, rgbs, poses12)
            if cfg.poselossonly:
                loss = loss_pose
            elif cfg.featurelossonly:
                loss = loss_f
            else:
                loss = loss_pose + loss_f
            return loss, new_state

        def step(params, state, opt_state, targets, rgbs, poses12,
                 rgb_perturb, pose_perturb12, lr):
            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, state, targets, rgbs, poses12, rgb_perturb, pose_perturb12)
            if cfg.freezeBN:
                # freeze_bn_layer parity: no grad on BN scale/bias
                for lvl in grads["adapt"].values():
                    lvl["bn_scale"] = jnp.zeros_like(lvl["bn_scale"])
                    lvl["bn_bias"] = jnp.zeros_like(lvl["bn_bias"])
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_state, opt_state, loss

        self._loss_fn = loss_fn      # exposed for golden-parity tests
        # stage-2 step is the retrace-dominated program on CLI restart —
        # serve it from the persistent jax.export cache when enabled.
        # Mesh-sharded programs are pinned to a device count by
        # jax.export (call-context mismatch errors) — plain jit there.
        from dfnet_tpu.utils.aot import aot_jit

        self._step = aot_jit(
            step, key=f"feature_step|{cfg!r}",
            cache_dir="" if self.mesh is not None else cfg.aot_cache_dir,
            donate_argnums=(0, 2), label="feature_step")

        def predict(params, state, images):
            # eval path: f32 convs regardless of feature_precision (pose
            # metrics of ported checkpoints must be bit-faithful)
            _, pose, _ = dfnet_forward(params, state, images, mcfg,
                                       return_feature=False,
                                       upsample_h=H, upsample_w=W, train_bn=False)
            return pose

        self._predict = jax.jit(predict)

    # ------------------------------------------------------------- data prep
    def prerender_train_views(self) -> np.ndarray:
        tr = self.scene.train
        return self.nerf.prerender_views(tr.poses, tr.hists)

    def rvs_refresh(self, rng: np.random.Generator
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Perturb every train pose and render the virtual views
        (run_feature.py:358-382)."""
        cfg, tr = self.cfg, self.scene.train
        poses = tr.poses
        b_min = poses[:, :3, 3].min(0) - cfg.d_max
        b_max = poses[:, :3, 3].max(0) + cfg.d_max
        perturbed = np.stack([
            perturb_single_render_pose(p, cfg.rvs_trans, cfg.rvs_rotation, rng)
            for p in poses])
        perturbed[:, :3, 3] = np.clip(perturbed[:, :3, 3], b_min, b_max)
        perturbed = perturbed.astype(np.float32)
        print("renders RVS...")
        virtual = self.nerf.prerender_views(perturbed, tr.hists, log_every=0)
        return perturbed, virtual

    # ------------------------------------------------------------- epochs
    @staticmethod
    def epoch_batches(n: int, b: int, rng: np.random.Generator):
        """Shuffled full-size index batches covering EVERY image — the
        reference DataLoader uses drop_last=False (run_feature.py:389) so
        the tail remainder trains too; static jit shapes require b, so
        the tail batch wraps around to the permutation head."""
        order = rng.permutation(n)
        pad = -n % b
        if pad:
            order = np.resize(order, n + pad)  # cyclic wrap (handles n < b)
        return [order[i:i + b] for i in range(0, len(order), b)]

    def train_epoch(self, targets, rgbs, virtue_view, poses_perturb,
                    rng: np.random.Generator) -> float:
        cfg, tr = self.cfg, self.scene.train
        n = len(tr)
        b = cfg.featurenet_batch_size
        lr = self.scheduler.lr
        losses = []
        dummy = np.zeros((b, self.scene.H, self.scene.W, 3), np.float32)
        dummy12 = np.zeros((b, 12), np.float32)

        def make_batch(idx):
            if cfg.random_view_synthesis:
                rp, pp = virtue_view[idx], poses_perturb[idx].reshape(b, 12)
            else:
                rp, pp = dummy, dummy12
            return (targets[idx], rgbs[idx], tr.poses[idx].reshape(b, 12),
                    rp, pp)

        batches = self.epoch_batches(n, b, rng)
        if cfg.prefetch > 0:
            # larger-than-HBM path: a background thread keeps `prefetch`
            # batches device-committed ahead of the step
            from dfnet_tpu.data.prefetch import PrefetchIterator

            it = PrefetchIterator(make_batch, batches, depth=cfg.prefetch)
        else:
            it = (jax.tree.map(jnp.asarray, make_batch(idx)) for idx in batches)
        for t, r, p12, rp, pp in it:
            self.params, self.state, self.opt_state, loss = self._step(
                self.params, self.state, self.opt_state, t, r, p12, rp, pp, lr)
            losses.append(float(loss))
        return float(np.mean(losses))

    def validate(self) -> float:
        """Val pose MSE (run_feature.py:389-399). The whole split is
        predicted in fixed-size device batches, one host sync at the end."""
        val = self.scene.val
        n = len(val)
        b = max(self.cfg.val_batch_size, 1)
        pad = -n % b
        imgs = np.concatenate([val.images, np.repeat(val.images[-1:], pad, 0)], 0) \
            if pad else val.images
        preds = [self._predict(self.params, self.state, jnp.asarray(imgs[i:i + b]))
                 for i in range(0, n + pad, b)]
        pred = np.concatenate([np.asarray(p) for p in preds], 0)[:n]
        gt = val.poses.reshape(n, 12)
        # per-batch means of the reference loop == overall mean when n % b == 0;
        # we use the overall mean (exact, and padding-safe)
        return float(np.mean((pred - gt) ** 2))

    def eval_median_error(self, split=None):
        split = split if split is not None else self.scene.val
        apply_fn = lambda imgs: self._predict(self.params, self.state, imgs)
        return get_error_in_q(apply_fn, split)

    # ------------------------------------------------------------- persistence
    def checkpoint_tree(self):
        return {"params": self.params, "state": self.state}

    def load(self, path: str):
        self.params, self.state = load_dfnet_params(path, self.model_cfg)
