"""Stage 1 — NeRF-H training (run_nerf equivalent).

Reference behavior (/root/reference/script/run_nerf.py:32-241):
per epoch, for every train image: sample N_rand random pixels, render
through coarse+fine, NerfWLoss, Adam with manual exponential LR decay
lr = lrate · 0.1^(epoch/(lrate_decay·1000)) (global_step advances per
epoch), checkpoint every i_weights epochs, render/evaluate every
i_testset.

TPU-first re-design: ray generation + pixel selection + render + loss +
Adam update are ONE jitted pure function with static shapes (no
host↔device ping-pong, no default-tensor-type hacks); the ray batch is
sharded over the device mesh ('data' axis) and XLA all-reduces grads
over ICI.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from dfnet_tpu.config import Config
from dfnet_tpu.data.scene import SceneData
from dfnet_tpu.models.factory import create_nerfh, render_settings
from dfnet_tpu.models.losses import img2mse, mse2psnr, nerfw_loss, to8b
from dfnet_tpu.parallel.mesh import data_sharding
from dfnet_tpu.render.rays import get_rays
from dfnet_tpu.render.volume import render_image, render_rays
from dfnet_tpu.training.checkpoints import latest_checkpoint, load_pytree, save_pytree


def exp_decayed_lr(cfg: Config, global_step: int) -> float:
    return cfg.lrate * (0.1 ** (global_step / (cfg.lrate_decay * 1000.0)))


def write_video(base: str, frames: np.ndarray, fps: int = 15) -> str:
    """Write an image sequence as mp4 (falls back to gif when no ffmpeg
    backend is installed). frames: (N, H, W[, 3]) floats in [0,1]."""
    import imageio.v2 as imageio

    from dfnet_tpu.models.losses import to8b

    frames8 = to8b(frames)
    try:
        path = base + ".mp4"
        imageio.mimwrite(path, frames8, fps=fps, quality=8)
    except Exception:
        path = base + ".gif"
        imageio.mimwrite(path, frames8, fps=fps)
    return path


class NeRFTrainer:
    """Owns model/params/optimizer and the jitted step/render functions."""

    VIEWS_PER_CALL = 8  # eval/video views rendered per jit dispatch

    def __init__(self, cfg: Config, scene: SceneData, mesh=None,
                 rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.scene = scene
        self.mesh = mesh
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.rng_seed)
        self.rng, key = jax.random.split(rng)
        self.model, self.params = create_nerfh(cfg, key)
        self.settings = render_settings(cfg, scene.near, scene.far)
        self.settings_test = render_settings(cfg, scene.near, scene.far, test=True)

        self.optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=cfg.lrate, b1=0.9, b2=0.999)
        self.opt_state = self.optimizer.init(self.params)
        self.global_step = 0

        # whole train split lives on device; steps index it there — no
        # per-step host→device image transfers
        self._dev_images = jax.device_put(scene.train.images)
        self._dev_poses = jax.device_put(scene.train.poses)
        self._dev_hists = jax.device_put(scene.train.hists)

        self._build_step()

    # ------------------------------------------------------------- step
    def _build_step(self):
        self._epoch = self._make_epoch(self.settings, primary=True)
        # culled-train warmup (opt-in, default 0): QUALITY.md's round-4
        # ablation measured warmup as a net LOSS (warmup 60 lands 0.15 dB
        # below warmup 0 at fixed epochs) — at init the coarse weights are
        # near-uniform so the [q, 1-q] interval covers ~the full range and
        # culling-from-0 is harmless. Kept as a flag for schedule research.
        self._epoch_warm = None
        if self.cfg.train_cull_q > 0.0 and self.cfg.train_cull_warmup > 0:
            import dataclasses as _dc

            warm = _dc.replace(self.settings, train_cull_q=0.0,
                               train_fine_total=0)
            self._epoch_warm = self._make_epoch(warm, primary=False)
        self._build_render()

    def _make_epoch(self, settings, primary: bool):
        cfg, model = self.cfg, self.model
        H, W, focal = self.scene.H, self.scene.W, self.scene.focal
        n_rand = cfg.N_rand
        optimizer = self.optimizer
        mesh = self.mesh
        shard = data_sharding(mesh) if mesh is not None else None

        from dfnet_tpu.render.volume import VanillaNeRFModel, render_rays_vanilla

        model_has_proposal = (getattr(model, "cfg_proposal", None) is not None
                              and "proposal" in self.params)

        # fused Pallas train step (custom-VJP kernels). Under a mesh the
        # GSPMD partitioner can't split a pallas_call, so the sharded
        # variant runs the kernels per-shard inside shard_map (ray-DP,
        # params replicated, grads pmean'd over ICI) — same scheme as
        # render_image_sharded.
        use_fused_train = False
        if cfg.fused_train and cfg.reduce_embedding != 2:
            from dfnet_tpu.render.fused_train import fused_train_supported

            n_shard = n_rand
            if mesh is not None:
                n_dev = mesh.devices.size
                n_shard = n_rand // n_dev if n_rand % n_dev == 0 else 0
            use_fused_train = (n_shard > 0
                               and fused_train_supported(model, settings,
                                                         n_shard))
        # surfaced for benches/logs: which step implementation actually
        # serves this config (wide MLPs, odd batches etc. fall back to XLA)
        self.uses_fused_train = use_fused_train

        def loss_fn(params, rays_o, rays_d, target, hist, rng, epoch):
            # epoch only matters for the DNeRF windowed embedding
            # (reduce_embedding==2); None otherwise to avoid tracing it
            ep = epoch if cfg.reduce_embedding == 2 else None
            if isinstance(model, VanillaNeRFModel):
                out = render_rays_vanilla(params, model, rays_o, rays_d,
                                          settings, rng, epoch=ep)
            elif use_fused_train:
                from dfnet_tpu.render.fused_train import \
                    render_rays_train_fused

                out = render_rays_train_fused(params, model, rays_o, rays_d,
                                              hist, settings, rng)
            else:
                out = render_rays(params, model, rays_o, rays_d, hist,
                                  settings, rng, epoch=ep)
            losses = nerfw_loss(out, target)
            loss = sum(losses.values())
            if model_has_proposal and "weights_fine" in out:
                # passive joint training of the tiny proposal sampler:
                # only the proposal sees gradients (fine weights are
                # stop-gradient), reference dynamics are untouched
                from dfnet_tpu.models.losses import proposal_bound_loss
                from dfnet_tpu.models.nerfw import nerfw_apply_rays
                from dfnet_tpu.render.volume import composite_nerfw

                z_vals = out["z_vals"]
                pts = (rays_o[:, None, :]
                       + rays_d[:, None, :] * z_vals[..., None])
                sig_p = nerfw_apply_rays(
                    params["proposal"], model.cfg_proposal,
                    model.embed_proposal(pts), sigma_only=True)
                comp_p = composite_nerfw(sig_p, z_vals,
                                         output_transient=False,
                                         sigma_only=True)
                loss = loss + cfg.proposal_loss_w * proposal_bound_loss(
                    comp_p["weights"], z_vals, out["weights_fine"],
                    out["z_all"])
            # aux is the raw MSE (not PSNR) so the sharded path can
            # pmean it exactly before the log transform
            return loss, img2mse(out["rgb"], target)

        if use_fused_train and mesh is not None:
            # per-shard fused kernels under shard_map; the per-shard rng
            # is folded with the mesh position so stratified jitter /
            # noise draws differ across shards (all rng use is off at
            # perturb=0, where this path is equivalence-tested against
            # the single-device step)
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            def _vg_worker(params, ro, rd, tgt, hb, rng, epoch):
                rng = jax.random.fold_in(rng,
                                         jax.lax.axis_index("data"))
                (loss, mse), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, ro, rd, tgt, hb, rng,
                                           epoch)
                return ((jax.lax.pmean(loss, "data"),
                         jax.lax.pmean(mse, "data")),
                        jax.lax.pmean(grads, "data"))

            sm_kw = dict(
                mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                          P(), P()),
                out_specs=((P(), P()), P()))
            try:
                # pallas outputs carry no varying-mesh-axes annotation
                value_and_grad_fn = shard_map(_vg_worker, check_vma=False,
                                              **sm_kw)
            except TypeError:  # older jax: check_rep
                value_and_grad_fn = shard_map(_vg_worker, check_rep=False,
                                              **sm_kw)
        else:
            def value_and_grad_fn(params, ro, rd, tgt, hb, rng, epoch):
                return jax.value_and_grad(loss_fn, has_aux=True)(
                    params, ro, rd, tgt, hb, rng, epoch)

        def step(params, opt_state, images, poses, hists, idx, rng, lr, epoch):
            image = jnp.take(images, idx, axis=0)
            pose = jnp.take(poses, idx, axis=0)
            hist = jnp.take(hists, idx, axis=0)
            k_sel, k_render = jax.random.split(rng)
            rays_o, rays_d = get_rays(H, W, focal, pose)
            sel = jax.random.permutation(k_sel, H * W)[:n_rand]
            rays_o = rays_o.reshape(-1, 3)[sel]
            rays_d = rays_d.reshape(-1, 3)[sel]
            target = image.reshape(-1, 3)[sel]
            hist_b = jnp.broadcast_to(hist[None], (n_rand,) + hist.shape)
            if shard is not None and not use_fused_train:
                rays_o = jax.lax.with_sharding_constraint(rays_o, shard)
                rays_d = jax.lax.with_sharding_constraint(rays_d, shard)
                target = jax.lax.with_sharding_constraint(target, shard)
                hist_b = jax.lax.with_sharding_constraint(hist_b, shard)

            (loss, mse), grads = value_and_grad_fn(
                params, rays_o, rays_d, target, hist_b, k_render, epoch)
            psnr = mse2psnr(mse)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, psnr

        donate = (0, 1) if self.cfg.donate_step else ()
        if primary:
            self._step = jax.jit(step, donate_argnums=donate)

        # whole-epoch driver: fori_loop over the shuffled image order so an
        # epoch is ONE dispatch (the per-step dispatch overhead through the
        # device relay costs ~8 ms/step — ~60% of the step itself)
        def epoch_fn(params, opt_state, images, poses, hists, order, rng,
                     lr, epoch):
            def body(j, carry):
                params, opt_state, loss, psnr, rng = carry
                rng, k = jax.random.split(rng)
                params, opt_state, loss, psnr = step(
                    params, opt_state, images, poses, hists, order[j], k,
                    lr, epoch)
                return (params, opt_state, loss, psnr, rng)

            init = (params, opt_state, jnp.float32(0.0), jnp.float32(0.0), rng)
            params, opt_state, loss, psnr, rng = jax.lax.fori_loop(
                0, order.shape[0], body, init)
            return params, opt_state, loss, psnr, rng

        return jax.jit(epoch_fn, donate_argnums=donate)

    def _build_render(self):
        cfg, model = self.cfg, self.model
        H, W, focal = self.scene.H, self.scene.W, self.scene.focal
        mesh = self.mesh
        shard = data_sharding(mesh) if mesh is not None else None

        # --render_factor: downsampled eval renders for fast preview
        rf = max(int(cfg.render_factor), 1) if cfg.render_factor else 1
        eh, ew, ef = H // rf, W // rf, focal / rf

        use_fast = False
        if cfg.fast_render and shard is None and cfg.reduce_embedding != 2:
            from dfnet_tpu.render.fast import fast_path_supported

            use_fast = fast_path_supported(model, self.settings_test)
        if use_fast:
            from dfnet_tpu.render.fast import (cull_schedule_kwargs,
                                               render_image_fast)

            def render_one(params, pose, hist, epoch):
                return render_image_fast(params, model, pose, hist, eh, ew,
                                         ef, self.settings_test,
                                         chunk=min(cfg.chunk, eh * ew),
                                         use_proposal=cfg.proposal_render,
                                         **cull_schedule_kwargs(cfg))
        elif mesh is not None and cfg.reduce_embedding != 2:
            from dfnet_tpu.render.fast import cull_schedule_kwargs
            from dfnet_tpu.render.volume import render_image_sharded

            def render_one(params, pose, hist, epoch):
                # shard_map over the mesh's ray axis; each shard uses the
                # fused kernels when the backend supports them
                return render_image_sharded(params, model, pose, hist, eh,
                                            ew, ef, self.settings_test, mesh,
                                            chunk=min(cfg.chunk, eh * ew),
                                            use_proposal=cfg.proposal_render,
                                            fuse_composite=False,
                                            **cull_schedule_kwargs(cfg))
        else:
            def render_one(params, pose, hist, epoch):
                ep = epoch if cfg.reduce_embedding == 2 else None
                return render_image(params, model, pose, hist, eh, ew, ef,
                                    self.settings_test,
                                    chunk=min(cfg.chunk, eh * ew), epoch=ep,
                                    shard=shard)

        self._render = jax.jit(render_one)

        def render_views(params, poses, hists, epoch):
            # lax.map over views: a whole eval/video chunk is ONE dispatch
            # (the device relay bills ~20-40 ms per synchronized call, so
            # per-view dispatches dominate eval wall-clock at small frames)
            def one(a):
                out = render_one(params, a[0], a[1], epoch)
                return {"rgb": out["rgb"], "disp": out["disp"]}

            return jax.lax.map(one, (poses, hists))

        self._render_views = jax.jit(render_views)
        self._render_factor = rf

    # ------------------------------------------------------------- epochs
    def train_epoch(self, epoch: int) -> Tuple[float, float]:
        """One pass over shuffled train images as a single dispatch;
        returns last (loss, psnr) like the reference (run_nerf.py:32-80
        returns the final batch's)."""
        cfg, tr = self.cfg, self.scene.train
        lr = exp_decayed_lr(cfg, self.global_step)
        order = jnp.asarray(np.random.permutation(len(tr)).astype(np.int32))
        self.rng, k = jax.random.split(self.rng)
        epoch_fn = self._epoch
        if self._epoch_warm is not None and epoch < cfg.train_cull_warmup:
            epoch_fn = self._epoch_warm
        elif self._epoch_warm is not None and epoch == cfg.train_cull_warmup:
            # first post-warmup epoch triggers a fresh jit of the culled
            # epoch fn (~20-120 s through the relay) — announce it so a
            # long run's mid-flight stall is explicable (ADVICE.md r3)
            print("[nerf] warmup done, switching to culled train schedule "
                  "(compiling)", flush=True)
        self.params, self.opt_state, loss, psnr, _ = epoch_fn(
            self.params, self.opt_state,
            self._dev_images, self._dev_poses, self._dev_hists,
            order, k, lr, jnp.float32(epoch))
        self.global_step += 1
        return float(loss), float(psnr)

    def render_split(self, split, savedir: Optional[str] = None,
                     max_images: Optional[int] = None,
                     stride: int = 1, video_base: Optional[str] = None) -> float:
        """Render a split at test settings; returns mean PSNR
        (render_path equivalent, rendering.py:403-458). With video_base,
        also writes <base>_rgb / <base>_disp videos (render_video_*)."""
        psnrs, rgbs, disps = [], [], []
        idxs = range(0, len(split), stride)
        if max_images:
            idxs = list(idxs)[:max_images]
        idxs = list(idxs)

        # batched dispatch (VIEWS_PER_CALL views per jit call, tail padded
        # by repetition) — same amortization as FrozenNeRF.prerender_views
        v = self.VIEWS_PER_CALL
        n = len(idxs)
        padded = idxs + [idxs[-1]] * (-n % v) if n else []
        outs = {"rgb": [], "disp": []}
        for s in range(0, len(padded), v):
            sel = padded[s:s + v]
            out = self._render_views(
                self.params, jnp.asarray(split.poses[sel]),
                jnp.asarray(split.hists[sel]), jnp.float32(self.global_step))
            outs["rgb"].append(np.asarray(out["rgb"]))
            outs["disp"].append(np.asarray(out["disp"]))
        all_rgb = np.concatenate(outs["rgb"], 0)[:n] if n else np.zeros((0,))
        all_disp = np.concatenate(outs["disp"], 0)[:n] if n else np.zeros((0,))

        for j, i in enumerate(idxs):
            rgb = all_rgb[j]
            gt = split.images[i]
            if self._render_factor != 1:
                from dfnet_tpu.data.color import downscale_area

                gt = downscale_area(gt, float(self._render_factor))
            p = -10.0 * np.log10(np.mean(np.square(rgb - gt)))
            psnrs.append(p)
            if video_base:
                rgbs.append(rgb)
                disps.append(all_disp[j])
            if savedir:
                os.makedirs(savedir, exist_ok=True)
                import imageio.v2 as imageio

                imageio.imwrite(osp.join(savedir, f"{j:03d}.png"), to8b(rgb))
                imageio.imwrite(osp.join(savedir, f"{j:03d}_GT.png"), to8b(gt))
                disp = all_disp[j]
                imageio.imwrite(osp.join(savedir, f"{j:03d}_disp.png"),
                                to8b(disp / max(disp.max(), 1e-8)))
        if video_base and rgbs:
            write_video(video_base + "_rgb", np.stack(rgbs))
            d = np.stack(disps)
            write_video(video_base + "_disp", d / max(d.max(), 1e-8))
        return float(np.mean(psnrs))

    # ------------------------------------------------------------- ckpt
    def expdir(self) -> str:
        return osp.join(self.cfg.basedir, self.cfg.expname)

    def save(self, epoch: int):
        path = osp.join(self.expdir(), f"{epoch:06d}.npz")
        save_pytree(path, {"params": self.params, "opt_state": self.opt_state},
                    global_step=self.global_step)
        return path

    def try_resume(self) -> int:
        """Load the newest checkpoint in the expdir (or cfg.ft_path)."""
        path = self.cfg.ft_path
        if not path or path == "None":
            path = latest_checkpoint(self.expdir())
        if not path or self.cfg.no_reload or not osp.exists(path):
            return 0
        tree, scalars = load_pytree(path)
        loaded = tree["params"]
        if isinstance(loaded, dict) and isinstance(self.params, dict):
            # checkpoints from before an optional subtree existed (e.g.
            # 'proposal') keep their fresh init for the missing keys
            for k in self.params:
                if k not in loaded:
                    print(f"[nerf] checkpoint lacks '{k}' — keeping fresh init")
                    loaded[k] = self.params[k]
        self.params = loaded
        if "opt_state" in tree:
            # saved state round-trips as plain tuples/dicts; re-hang the
            # leaves on the live optax state's treedef
            leaves = jax.tree.leaves(tree["opt_state"])
            ref_leaves, treedef = jax.tree.flatten(self.opt_state)
            if len(leaves) == len(ref_leaves):
                self.opt_state = jax.tree.unflatten(treedef, leaves)
            else:
                print("[nerf] checkpoint opt_state shape mismatch "
                      f"({len(leaves)} vs {len(ref_leaves)} leaves) — "
                      "optimizer restarts cold")
        self.global_step = int(scalars.get("global_step", 0))
        print(f"[nerf] resumed from {path} at step {self.global_step}")
        return self.global_step

    def load_params(self, path: str):
        tree, scalars = load_pytree(path)
        self.params = tree["params"] if "params" in tree else tree
        self.global_step = int(scalars.get("global_step", 0))
