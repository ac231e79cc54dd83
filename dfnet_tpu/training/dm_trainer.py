"""Stage 3 — DFNet_dm direct feature matching (train.py equivalent).

Reference behavior (/root/reference/script/feature/direct_feature_matching.py):
per image (batch 1): pose model F predicts a pose (optionally
SVD-projected onto rotations, :88-93); the frozen NeRF renders at that
pose at quarter resolution, bicubic-upsampled back (:341-348); the
frozen feature model G extracts siamese features of [real, render]; the
loss w0·poseMSE + w1·photoMSE + w2·cosineFeature backpropagates THROUGH
the differentiable volume renderer into the predicted pose and updates
F only (:358-380). With combine_loss_w=[0,0,1] and finetune_unlabel the
whole stage is self-supervised (no GT poses consumed).

TPU-first: the entire chain F → rescale → rays → render → upsample → G
→ losses → grad(F) → Adam is ONE jitted function; per-epoch eval renders
N_rand random rays at the predicted pose for the val PSNR.
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
from dfnet_tpu.models.dfnet import DFNetConfig, dfnet_forward
from dfnet_tpu.models.losses import img2mse, mse2psnr
from dfnet_tpu.pose import project_rotation_svd, rescale_poses_to_nerf
from dfnet_tpu.render.rays import get_rays
from dfnet_tpu.render.volume import render_rays
from dfnet_tpu.training.callbacks import EarlyStopping
from dfnet_tpu.training.eval_pose import get_error_in_q
from dfnet_tpu.training.feature_losses import cosine_feature_loss, pose_loss
from dfnet_tpu.training.feature_trainer import load_dfnet_params
from dfnet_tpu.training.nerf_renderer import FrozenNeRF


def select_levels_for_loss(feats: jnp.ndarray, levels) -> jnp.ndarray:
    """(L,B,H,W,C) → (B, L'*C, H*W): select feature levels and flatten,
    the preprocess_features_for_loss equivalent
    (direct_feature_matching.py:41-50, channels-first)."""
    sel = feats[jnp.asarray(levels)]                    # (L',B,H,W,C)
    L, B, H, W, C = sel.shape
    sel = jnp.transpose(sel, (1, 0, 4, 2, 3))           # (B,L',C,H,W)
    return sel.reshape(B, L * C, H * W)


class DMTrainer:
    def __init__(self, cfg: Config, scene: SceneData, nerf: FrozenNeRF,
                 rng: Optional[jax.Array] = None):
        assert cfg.pretrain_model_path, "stage 3 requires a pretrained DFNet (--pretrain_model_path)"
        self.cfg = cfg
        self.scene = scene
        self.nerf = nerf
        self.model_cfg = DFNetConfig.small() if cfg.DFNet_s else DFNetConfig()
        self._cdt = (jnp.bfloat16 if cfg.feature_precision == "bf16"
                     else jnp.float32)

        # pose model F (trainable) and feature model G (frozen)
        self.params, self.state = load_dfnet_params(
            cfg.pretrain_model_path, self.model_cfg)
        feat_path = cfg.pretrain_featurenet_path or cfg.pretrain_model_path
        self.feat_params, self.feat_state = load_dfnet_params(
            feat_path, self.model_cfg)

        self.optimizer = optax.adam(cfg.learning_rate)
        self.opt_state = self.optimizer.init(self.params)
        self.early_stopping = EarlyStopping(
            osp.join(cfg.basedir, cfg.model_name or "dfnetdm"),
            patience=cfg.patience[0], val_on_psnr=cfg.val_on_psnr)
        self.rng = rng if rng is not None else jax.random.PRNGKey(cfg.rng_seed)
        self._build()

    # ------------------------------------------------------------- jit fns
    def _build(self):
        cfg, mcfg = self.cfg, self.model_cfg
        H, W = self.scene.H, self.scene.W
        # dm default is 2 weights (dm/options.py:181); the loss uses 3 —
        # pad with zeros so [0.5, 0.5] means pose+photo only
        w = (list(cfg.combine_loss_w) + [0.0, 0.0, 0.0])[:3]
        levels = tuple(cfg.feature_matching_lvl)
        nerf = self.nerf
        optimizer = self.optimizer

        def predict_pose(params, image, dtype=None):
            """F forward → (3,4) pose with optional SVD projection.

            dtype: conv-stack compute dtype. Train steps pass the
            configured feature_precision; EVAL paths keep the f32
            default so ported-checkpoint pose metrics are exact."""
            _, pose12, _ = dfnet_forward(params, self.state, image[None], mcfg,
                                         return_feature=False,
                                         upsample_h=H, upsample_w=W,
                                         compute_dtype=dtype or jnp.float32)
            pose = pose12.reshape(1, 3, 4)
            if cfg.svd_reg:
                pose = project_rotation_svd(pose)
            return pose

        def loss_fn(params, nerf_params, feat_params, image, pose_gt12, hist):
            pose = predict_pose(params, image, self._cdt)
            rgb = nerf.render_fn(nerf_params, pose[0], hist)      # (H,W,3)
            x = jnp.stack([image, rgb], 0)                        # [real; render]
            feats, _, _ = dfnet_forward(
                feat_params, self.feat_state, x, mcfg, return_feature=True,
                is_single_stream=False, return_pose=False,
                upsample_h=H, upsample_w=W, compute_dtype=self._cdt)
            f_t = select_levels_for_loss(feats[0], levels)
            f_r = select_levels_for_loss(feats[1], levels)
            feat_l = cosine_feature_loss(f_r[0], f_t[0],
                                         per_channel=cfg.per_channel)
            photo_l = img2mse(rgb, image)
            pose_l = pose_loss(pose.reshape(1, 12), pose_gt12)
            loss = w[0] * pose_l + w[1] * photo_l + w[2] * feat_l
            psnr = mse2psnr(photo_l)
            return loss, psnr

        def step(params, opt_state, image, pose_gt12, hist):
            (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, nerf.params, self.feat_params, image, pose_gt12, hist)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, psnr

        self._loss_fn = loss_fn      # exposed for parity tests
        # the stage-3 step bakes the frozen NeRF + feature-net weights in
        # as jit constants — their VALUES go into the AOT cache key
        from dfnet_tpu.utils.aot import aot_jit

        self._step = aot_jit(
            step, key=f"dm_step|{cfg!r}", cache_dir=cfg.aot_cache_dir,
            donate_argnums=(0, 1), label="dm_step",
            consts=(nerf.params, self.feat_params, self.feat_state,
                    self.state))
        self._predict_pose = jax.jit(predict_pose)

        # ---- batched step (--dm_batch_size K > 1): K images per update.
        # The reference loops single images (direct_feature_matching.py:322)
        # — nothing forces that on TPU: predict K poses in one DFNet
        # dispatch, render K views as ONE flattened ray stream
        # (render_fn_batch), one siamese feature pass over 2K images, and
        # ONE Adam update on the MEAN of the per-image losses. Per-image
        # math is identical to the K=1 step (pinned by
        # tests/test_dm_training.py); only the update cadence changes
        # (K-image mean-grad steps — convergence A/B in QUALITY.md).
        def batched_loss_fn(params, nerf_params, feat_params, images,
                            poses_gt12, hists):
            _, pose12, _ = dfnet_forward(params, self.state, images, mcfg,
                                         return_feature=False,
                                         upsample_h=H, upsample_w=W,
                                         compute_dtype=self._cdt)
            k = images.shape[0]
            poses = pose12.reshape(k, 3, 4)
            if cfg.svd_reg:
                poses = project_rotation_svd(poses)
            rgbs = nerf.render_fn_batch(nerf_params, poses, hists)
            x = jnp.concatenate([images, rgbs], 0)    # [reals; renders]
            feats, _, _ = dfnet_forward(
                feat_params, self.feat_state, x, mcfg, return_feature=True,
                is_single_stream=False, return_pose=False,
                upsample_h=H, upsample_w=W, compute_dtype=self._cdt)
            f_t = select_levels_for_loss(feats[0], levels)    # (K, L'C, HW)
            f_r = select_levels_for_loss(feats[1], levels)
            feat_l = jax.vmap(
                lambda a, b: cosine_feature_loss(
                    a, b, per_channel=cfg.per_channel))(f_r, f_t)
            photo_l = jnp.mean((rgbs - images) ** 2, axis=(1, 2, 3))
            # pose loss on the (svd-projected, when enabled) pose — same
            # as the per-image path
            pose_l = jnp.mean((poses.reshape(k, 12) - poses_gt12) ** 2,
                              axis=1)
            losses = w[0] * pose_l + w[1] * photo_l + w[2] * feat_l  # (K,)
            return jnp.mean(losses), (losses, mse2psnr(photo_l))

        def batched_step(params, opt_state, images, poses_gt12, hists):
            (_, (losses, psnrs)), grads = jax.value_and_grad(
                batched_loss_fn, has_aux=True)(
                params, nerf.params, self.feat_params, images,
                poses_gt12, hists)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses, psnrs

        if cfg.dm_batch_size > 1:
            self._step_batch = aot_jit(
                batched_step, key=f"dm_step_batch|{cfg!r}",
                cache_dir=cfg.aot_cache_dir, donate_argnums=(0, 1),
                label="dm_step_batch",
                consts=(nerf.params, self.feat_params, self.feat_state,
                        self.state))
        else:
            self._step_batch = None
        self._batched_loss_fn = batched_loss_fn   # for parity tests

        # --------------------------------------------------------- eval
        n_rand = cfg.N_rand
        ws = self.scene.world_setup
        focal = self.scene.focal

        def eval_one(params, nerf_params, image, pose_gt12, hist, rng):
            pose = predict_pose(params, image)
            pose_l = pose_loss(pose.reshape(1, 12), pose_gt12)
            pose_nerf = rescale_poses_to_nerf(
                pose[0], ws["pose_scale"], ws["move_all_cam_vec"], ws["pose_scale2"])
            rays_o, rays_d = get_rays(H, W, focal, pose_nerf)
            sel = jax.random.permutation(rng, H * W)[:n_rand]
            out = render_rays(nerf_params, nerf.model,
                              rays_o.reshape(-1, 3)[sel],
                              rays_d.reshape(-1, 3)[sel],
                              jnp.broadcast_to(hist[None], (n_rand,) + hist.shape),
                              nerf.settings)
            target = image.reshape(-1, 3)[sel]
            psnr = mse2psnr(img2mse(out["rgb"], target))
            return pose_l, psnr

        self._eval_one = jax.jit(eval_one)

        def eval_batch(params, nerf_params, images, poses12, hists, rngs):
            """lax.map over a chunk of val images — one dispatch for the
            whole chunk instead of one per image."""
            return jax.lax.map(
                lambda a: eval_one(params, nerf_params, a[0], a[1][None],
                                   a[2], a[3]),
                (images, poses12, hists, rngs))

        self._eval_batch = jax.jit(eval_batch)

        def predict12(params, images):
            # eval path: f32 convs regardless of feature_precision (pose
            # metrics of ported checkpoints must be bit-faithful)
            _, pose12, _ = dfnet_forward(params, self.state, images, mcfg,
                                         return_feature=False,
                                         upsample_h=H, upsample_w=W)
            return pose12

        self._predict12 = jax.jit(predict12)

    # --------------------------------------------------------- variants
    def build_photometric_step(self):
        """Direct-PoseNet-lineage photometric training step: rgb MSE on
        N_rand random rays rendered at the predicted pose (reference:
        /root/reference/script/dm/direct_pose_model.py:228-276,
        train_nerf_tracking lineage — present in the reference but not
        reachable from its shipped configs)."""
        cfg = self.cfg
        H, W = self.scene.H, self.scene.W
        focal = self.scene.focal
        ws = self.scene.world_setup
        nerf = self.nerf
        optimizer = self.optimizer
        n_rand = cfg.N_rand
        mcfg = self.model_cfg
        w = cfg.combine_loss_w

        def predict_pose(params, image):
            _, pose12, _ = dfnet_forward(params, self.state, image[None], mcfg,
                                         return_feature=False,
                                         upsample_h=H, upsample_w=W, compute_dtype=self._cdt)
            pose = pose12.reshape(1, 3, 4)
            if cfg.svd_reg:
                pose = project_rotation_svd(pose)
            return pose

        def loss_fn(params, image, pose_gt12, hist, rng):
            pose = predict_pose(params, image)
            pose_nerf = rescale_poses_to_nerf(
                pose[0], ws["pose_scale"], ws["move_all_cam_vec"], ws["pose_scale2"])
            rays_o, rays_d = get_rays(H, W, focal, pose_nerf)
            sel = jax.random.permutation(rng, H * W)[:n_rand]
            out = render_rays(nerf.params, nerf.model,
                              rays_o.reshape(-1, 3)[sel],
                              rays_d.reshape(-1, 3)[sel],
                              jnp.broadcast_to(hist[None], (n_rand,) + hist.shape),
                              nerf.settings)
            target = image.reshape(-1, 3)[sel]
            photo_l = img2mse(out["rgb"], target)
            pose_l = pose_loss(pose.reshape(1, 12), pose_gt12)
            loss = w[0] * pose_l + w[1] * photo_l if len(w) >= 2 else photo_l
            return loss, mse2psnr(photo_l)

        def step(params, opt_state, image, pose_gt12, hist, rng):
            (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, image, pose_gt12, hist, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, psnr

        return jax.jit(step, donate_argnums=(0, 1))

    def train_epoch_photometric(self, step_fn, rng: np.random.Generator):
        tr = self.scene.train
        losses, psnrs = [], []
        for i in rng.permutation(len(tr)):
            self.rng, k = jax.random.split(self.rng)
            self.params, self.opt_state, loss, psnr = step_fn(
                self.params, self.opt_state, jnp.asarray(tr.images[i]),
                jnp.asarray(tr.poses[i].reshape(1, 12)),
                jnp.asarray(tr.hists[i]), k)
            losses.append(float(loss))
            psnrs.append(float(psnr))
        return float(np.mean(losses)), float(np.mean(psnrs))

    def build_feature_nerf_step(self, feature_nerf: FrozenNeRF):
        """Feature-field matching step: the NeRF emits rgb+C features per
        ray; match rendered ray features against G's level-0 feature map
        at the sampled pixels (reference train_on_feature_batch,
        direct_feature_matching.py:235-320 — requires a feature-output
        NeRF; not exercised by the reference's shipped configs)."""
        cfg = self.cfg
        H, W = self.scene.H, self.scene.W
        focal = self.scene.focal
        ws = self.scene.world_setup
        optimizer = self.optimizer
        n_rand = cfg.N_rand
        mcfg = self.model_cfg
        w = cfg.combine_loss_w

        def loss_fn(params, image, pose_gt12, hist, rng):
            _, pose12, _ = dfnet_forward(params, self.state, image[None], mcfg,
                                         return_feature=False,
                                         upsample_h=H, upsample_w=W, compute_dtype=self._cdt)
            pose = pose12.reshape(1, 3, 4)
            if cfg.svd_reg:
                pose = project_rotation_svd(pose)
            pose_nerf = rescale_poses_to_nerf(
                pose[0], ws["pose_scale"], ws["move_all_cam_vec"], ws["pose_scale2"])
            rays_o, rays_d = get_rays(H, W, focal, pose_nerf)
            sel = jax.random.permutation(rng, H * W)[:n_rand]
            out = render_rays(feature_nerf.params, feature_nerf.model,
                              rays_o.reshape(-1, 3)[sel],
                              rays_d.reshape(-1, 3)[sel],
                              jnp.broadcast_to(hist[None], (n_rand,) + hist.shape),
                              feature_nerf.settings)
            rgbf = out["rgb"]                       # (N, 3+C)
            rgb = rgbf[:, :3]
            feat_render = rgbf[:, 3:].T             # (C, N)
            target = image.reshape(-1, 3)[sel]
            feats, _, _ = dfnet_forward(
                self.feat_params, self.feat_state, image[None], mcfg,
                return_feature=True, is_single_stream=True, return_pose=False,
                upsample_h=H, upsample_w=W, compute_dtype=self._cdt)
            f0 = feats[0][0, 0].reshape(H * W, -1)[sel].T   # (C, N)
            photo_l = img2mse(rgb, target)
            feat_l = cosine_feature_loss(feat_render, f0,
                                         per_channel=cfg.per_channel)
            pose_l = pose_loss(pose.reshape(1, 12), pose_gt12)
            loss = w[0] * pose_l + w[1] * photo_l + w[2] * feat_l
            return loss, mse2psnr(photo_l)

        def step(params, opt_state, image, pose_gt12, hist, rng):
            (loss, psnr), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, image, pose_gt12, hist, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, psnr

        return jax.jit(step, donate_argnums=(0, 1))

    # ------------------------------------------------------------- epochs
    def train_epoch(self, rng: np.random.Generator) -> Tuple[float, float]:
        tr = self.scene.train
        order = rng.permutation(len(tr))
        k = self.cfg.dm_batch_size
        losses, psnrs = [], []

        if self._step_batch is not None and len(order) >= k:
            # full K-image batches through the batched step; the tail
            # (n % K images) goes through the per-image step so every
            # image still trains each epoch
            n_full = (len(order) // k) * k
            for s in range(0, n_full, k):
                idx = order[s:s + k]
                self.params, self.opt_state, ls, ps = self._step_batch(
                    self.params, self.opt_state,
                    jnp.asarray(tr.images[idx]),
                    jnp.asarray(tr.poses[idx].reshape(k, 12)),
                    jnp.asarray(tr.hists[idx]))
                losses.extend(np.asarray(ls).tolist())
                psnrs.extend(np.asarray(ps).tolist())
            order = order[n_full:]

        def make_batch(i):
            return (tr.images[i], tr.poses[i].reshape(1, 12), tr.hists[i])

        if self.cfg.prefetch > 0 and len(order):
            from dfnet_tpu.data.prefetch import PrefetchIterator

            it = PrefetchIterator(make_batch, order, depth=self.cfg.prefetch)
        else:
            it = (jax.tree.map(jnp.asarray, make_batch(i)) for i in order)
        for image, pose12, hist in it:
            self.params, self.opt_state, loss, psnr = self._step(
                self.params, self.opt_state, image, pose12, hist)
            losses.append(float(loss))
            psnrs.append(float(psnr))
        return float(np.mean(losses)), float(np.mean(psnrs))

    EVAL_CHUNK = 8

    def eval_epoch(self) -> Tuple[float, float]:
        """Val pose-MSE + PSNR at the predicted pose
        (eval_on_epoch equivalent, direct_feature_matching.py:178-233).
        Images are evaluated EVAL_CHUNK per dispatch."""
        val = self.scene.val
        n = len(val)
        v = self.EVAL_CHUNK
        pad = -n % v
        imgs = np.concatenate([val.images, np.repeat(val.images[-1:], pad, 0)], 0) \
            if pad else val.images
        poses12 = np.concatenate(
            [val.poses.reshape(n, 12),
             np.repeat(val.poses[-1:].reshape(1, 12), pad, 0)], 0) \
            if pad else val.poses.reshape(n, 12)
        hists = np.concatenate([val.hists, np.repeat(val.hists[-1:], pad, 0)], 0) \
            if pad else val.hists
        losses, psnrs = [], []
        for i in range(0, n + pad, v):
            self.rng, k = jax.random.split(self.rng)
            ks = jax.random.split(k, v)
            pose_l, psnr = self._eval_batch(
                self.params, self.nerf.params, jnp.asarray(imgs[i:i + v]),
                jnp.asarray(poses12[i:i + v]), jnp.asarray(hists[i:i + v]), ks)
            losses.append(np.asarray(pose_l))
            psnrs.append(np.asarray(psnr))
        losses = np.concatenate(losses)[:n]
        psnrs = np.concatenate(psnrs)[:n]
        return float(np.mean(losses)), float(np.mean(psnrs))

    def eval_median_error(self, split=None):
        split = split if split is not None else self.scene.val
        apply_fn = lambda imgs: self._predict12(self.params, imgs)
        return get_error_in_q(apply_fn, split)

    def checkpoint_tree(self):
        return {"params": self.params, "state": self.state}
