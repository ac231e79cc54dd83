"""FrozenNeRF: the trained NeRF-H as a differentiable render service for
stages 2/3.

Wraps (params, model, settings) with the world rescale applied to
APR-frame poses (fix_coord_supp equivalent, reference:
/root/reference/script/dm/direct_pose_model.py:147-167) and the
tinyimg render-at-1/tinyscale-then-bicubic-upsample path (reference:
script/feature/misc.py:230-237, direct_feature_matching.py:341-348).
The whole pose→rays→render→upsample chain is one jitted function and is
differentiable w.r.t. the pose (stage 3's core requirement).
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dfnet_tpu.config import Config
from dfnet_tpu.models.factory import create_nerfh, render_settings
from dfnet_tpu.ops.resize import resize_bicubic
from dfnet_tpu.pose import rescale_poses_to_nerf
from dfnet_tpu.render.volume import NeRFHModel, render_image, render_rays
from dfnet_tpu.training.checkpoints import latest_checkpoint, load_pytree


class FrozenNeRF:
    def __init__(self, cfg: Config, hwf, near: float, far: float,
                 world_setup: Dict, params: Optional[Dict] = None,
                 model: Optional[NeRFHModel] = None, mesh=None):
        self.cfg = cfg
        self.H, self.W = int(hwf[0]), int(hwf[1])
        self.focal = float(hwf[2])
        self.world_setup = world_setup
        self.mesh = mesh
        if model is None:
            model, init_params = create_nerfh(cfg, jax.random.PRNGKey(cfg.rng_seed))
            params = params if params is not None else init_params
        self.model = model
        self.params = jax.lax.stop_gradient(params)
        self.settings = render_settings(cfg, near, far, test=True)
        self._build()

    # ------------------------------------------------------------- loading
    @classmethod
    def from_experiment(cls, cfg: Config, hwf, near, far, world_setup,
                        mesh=None) -> "FrozenNeRF":
        """Load the latest stage-1 checkpoint from <basedir>/<expname>
        (create_nerf auto-reload parity, nerfw.py:452-472). Also accepts
        reference .tar checkpoints via the converter."""
        obj = cls(cfg, hwf, near, far, world_setup, mesh=mesh)
        path = cfg.ft_path
        if not path or path == "None":
            expdir = osp.join(cfg.basedir, cfg.expname)
            path = latest_checkpoint(expdir)
            if path is None:
                path = latest_checkpoint(expdir, pattern=r"^(\d+)\.tar$")
        if path and osp.exists(path) and not cfg.no_reload:
            obj.load(path)
        else:
            print("[FrozenNeRF] WARNING: no NeRF checkpoint found — random weights")
        return obj

    def load(self, path: str):
        if path.endswith(".tar"):
            from dfnet_tpu.convert import convert_nerf_checkpoint

            params, _ = convert_nerf_checkpoint(path, D=self.cfg.netdepth)
        else:
            tree, _ = load_pytree(path)
            params = tree["params"] if "params" in tree else tree
        self.params = jax.tree.map(jnp.asarray, params)
        print(f"[FrozenNeRF] loaded {path}")

    # ------------------------------------------------------------- render
    def _build(self):
        cfg, model, settings = self.cfg, self.model, self.settings
        H, W, focal = self.H, self.W, self.focal
        ws = self.world_setup
        tiny = cfg.tinyimg
        ts = cfg.tinyscale if tiny else 1.0
        rh, rw = (int(H // ts), int(W // ts)) if tiny else (H, W)
        rf = focal / ts if tiny else focal
        chunk = min(cfg.chunk, rh * rw)
        shard = None
        if self.mesh is not None:
            from dfnet_tpu.parallel.mesh import data_sharding

            shard = data_sharding(self.mesh)

        def render_at_pose(params, pose_apr, hist):
            """pose_apr: (3,4) in the APR (metric, centered) frame.
            XLA path — differentiable w.r.t. pose (stage 3 grads)."""
            pose_nerf = rescale_poses_to_nerf(
                pose_apr, ws["pose_scale"], ws["move_all_cam_vec"], ws["pose_scale2"])
            out = render_image(params, model, pose_nerf, hist, rh, rw, rf,
                               settings, chunk=chunk, shard=shard)
            rgb = out["rgb"]
            if tiny:
                rgb = resize_bicubic(rgb, H, W)
            return rgb

        # no-grad renders (eval sweeps, stage-2/3 pre-renders) go through
        # the fused Pallas kernels when the model supports them
        use_fast = False
        if cfg.fast_render and shard is None:
            from dfnet_tpu.render.fast import fast_path_supported

            use_fast = fast_path_supported(model, settings)
        if use_fast:
            from dfnet_tpu.render.fast import (cull_schedule_kwargs,
                                               render_image_fast)

            def render_at_pose_nograd(params, pose_apr, hist):
                pose_nerf = rescale_poses_to_nerf(
                    pose_apr, ws["pose_scale"], ws["move_all_cam_vec"],
                    ws["pose_scale2"])
                out = render_image_fast(params, model, pose_nerf, hist,
                                        rh, rw, rf, settings, chunk=chunk,
                                        use_proposal=cfg.proposal_render,
                                        **cull_schedule_kwargs(cfg))
                rgb = out["rgb"]
                if tiny:
                    rgb = resize_bicubic(rgb, H, W)
                return rgb
        else:
            render_at_pose_nograd = render_at_pose

        def render_batch_grad(params, poses_apr, hists):
            """(B,3,4),(B,hist_bin) → (B,H,W,3), differentiable w.r.t.
            the poses — the batched analog of render_fn for stage-3
            batched steps. Rays of ALL B views are flattened into one
            ray stream so the chunked render runs at B× the arithmetic
            intensity (the reference's per-image loop,
            direct_feature_matching.py:322, leaves the accelerator
            underfed at tinyimg sizes). Per-ray math is identical to
            render_fn, so outputs match the per-image path exactly."""
            from dfnet_tpu.render.rays import get_rays

            b = poses_apr.shape[0]
            poses_nerf = rescale_poses_to_nerf(
                poses_apr, ws["pose_scale"], ws["move_all_cam_vec"],
                ws["pose_scale2"])
            ro, rd = jax.vmap(lambda p: get_rays(rh, rw, rf, p))(poses_nerf)
            ro = ro.reshape(-1, 3)
            rd = rd.reshape(-1, 3)
            hist_r = jnp.repeat(hists, rh * rw, axis=0)        # (B*rh*rw, HB)
            n = ro.shape[0]
            ck = min(chunk, n)
            n_pad = -n % ck
            ro = jnp.concatenate([ro, jnp.zeros((n_pad, 3), ro.dtype)], 0)
            rd = jnp.concatenate([rd, jnp.ones((n_pad, 3), rd.dtype)], 0)
            hist_r = jnp.concatenate(
                [hist_r, jnp.zeros((n_pad,) + hist_r.shape[1:],
                                   hist_r.dtype)], 0)
            nc = (n + n_pad) // ck
            rgb = jax.lax.map(
                lambda a: render_rays(params, model, a[0], a[1], a[2],
                                      settings)["rgb"],
                (ro.reshape(nc, ck, 3), rd.reshape(nc, ck, 3),
                 hist_r.reshape(nc, ck, -1)))
            rgb = rgb.reshape(-1, 3)[:n].reshape(b, rh, rw, 3)
            if tiny:
                rgb = resize_bicubic(rgb, H, W)
            return rgb

        self.render_fn_batch = render_batch_grad

        from dfnet_tpu.utils.aot import aot_jit

        # mesh-sharded programs are device-count-pinned under jax.export
        # (see feature_trainer) — AOT-cache only the unsharded case
        aot_dir = "" if self.mesh is not None else cfg.aot_cache_dir
        _key = (f"{cfg!r}|hwf={H},{W},{focal}|ws={sorted(ws.items())}"
                f"|fast={use_fast}")
        self._render_at_pose = aot_jit(
            render_at_pose_nograd, key=f"render_at_pose|{_key}",
            cache_dir=aot_dir, label="render_at_pose")
        self.render_fn = render_at_pose  # un-jitted, for embedding in larger jits (differentiable)

        def render_batch(params, poses, hists):
            """(V,3,4),(V,hist_bin) → (V,H,W,3): lax.map over views so a
            whole sweep chunk is one dispatch."""
            return jax.lax.map(
                lambda a: render_at_pose_nograd(params, a[0], a[1]),
                (poses, hists))

        self._render_batch = aot_jit(
            render_batch, key=f"render_batch|{_key}",
            cache_dir=aot_dir, label="render_batch")

    def render_at_pose(self, pose_apr, hist) -> jnp.ndarray:
        """(H, W, 3) rgb at the given APR-frame pose."""
        return self._render_at_pose(self.params, jnp.asarray(pose_apr),
                                    jnp.asarray(hist))

    VIEWS_PER_CALL = 8

    def prerender_views(self, poses: np.ndarray, hists: np.ndarray,
                        log_every: int = 10) -> np.ndarray:
        """Render every view (render_nerfw_imgs equivalent,
        misc.py:203-252). Views are batched VIEWS_PER_CALL per dispatch
        (one jit call renders a whole chunk). Returns (N, H, W, 3)
        float32 on host."""
        n = poses.shape[0]
        v = self.VIEWS_PER_CALL
        pad = -n % v
        poses_p = np.concatenate([poses, np.repeat(poses[-1:], pad, 0)], 0) \
            if pad else poses
        hists_p = np.concatenate([hists, np.repeat(hists[-1:], pad, 0)], 0) \
            if pad else hists
        outs = []
        for i in range(0, n + pad, v):
            if log_every and i % max(log_every, v) == 0:
                print(f"renders {i}/total {n}")
            outs.append(np.asarray(self._render_batch(
                self.params, jnp.asarray(poses_p[i:i + v]),
                jnp.asarray(hists_p[i:i + v]))))
        return np.concatenate(outs, 0)[:n].astype(np.float32)
