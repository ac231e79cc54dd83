#!/usr/bin/env python
"""Data-enabled parity protocol for a real 7-Scenes (or Cambridge) scene.

One command that, given a scene directory and released reference
checkpoints, runs the full parity pipeline against BASELINE.md:

  1. port the torch checkpoints (.tar NeRF-H / .pt DFNet) via convert.py
  2. render the NeRF test split -> mean PSNR (the reference's
     --render_test protocol, rendering.py:431-457)
  3. DFNet pose regression on the test split -> median/mean translation
     (m) and rotation (deg) errors (pose_model.py:136-173 protocol)

Usage (with data + released checkpoints):
  python scripts/parity_7scenes.py --datadir ../data/7Scenes/heads \
      --nerf_ckpt paper_models/heads_nerfh.tar \
      --dfnet_ckpt paper_models/checkpoint-0888-0.0025.pt

Dry run (no data needed — validates the whole protocol end-to-end on a
miniature on-disk 7-Scenes replica + locally built checkpoints):
  python scripts/parity_7scenes.py --dryrun
"""
import argparse
import os
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def port_nerf(path: str, D: int):
    """Reference .tar -> our param pytree (convert.py); .npz passes
    through."""
    from dfnet_tpu.training.checkpoints import load_pytree

    if path.endswith(".tar"):
        from dfnet_tpu.convert import convert_nerf_checkpoint

        tree = convert_nerf_checkpoint(path, D=D)
        tree.pop("global_step", None)
        return jax.tree.map(jnp.asarray, tree)
    tree, _ = load_pytree(path)
    params = tree.get("params", tree)
    return jax.tree.map(jnp.asarray, params)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--datadir", default="")
    ap.add_argument("--dataset_type", default="7Scenes")
    ap.add_argument("--nerf_ckpt", default="")
    ap.add_argument("--dfnet_ckpt", default="")
    ap.add_argument("--df", type=float, default=2.0)
    ap.add_argument("--max_render_views", type=int, default=0,
                    help="cap rendered test views (0 = all)")
    ap.add_argument("--dryrun", action="store_true",
                    help="run on a miniature generated replica")
    args = ap.parse_args(argv)

    if args.dryrun:
        # protocol check needs no TPU; keep the real chip free (the
        # sitecustomize pre-import makes JAX_PLATFORMS=cpu too late)
        jax.config.update("jax_platforms", "cpu")

    from dfnet_tpu.config import parse_args
    from dfnet_tpu.data.loader import load_scene
    from dfnet_tpu.models.factory import create_nerfh, render_settings
    from dfnet_tpu.render.volume import render_image
    from dfnet_tpu.training.eval_pose import get_error_in_q
    from dfnet_tpu.training.feature_trainer import FeatureTrainer

    workdir = None
    if args.dryrun:
        workdir = tempfile.mkdtemp(prefix="parity_dryrun_")
        if args.dataset_type == "Cambridge":
            args.datadir = _make_dryrun_fixture_cambridge(workdir)
        else:
            args.datadir = _make_dryrun_fixture(workdir)
        print(f"[dryrun] miniature {args.dataset_type} replica at "
              f"{args.datadir}")

    base = ["--dataset_type", args.dataset_type, "--datadir", args.datadir,
            "--NeRFH", "--encode_hist", "--df", str(args.df)]
    if args.dryrun:
        base += ["--netdepth", "2", "--netwidth", "32", "--netdepth_fine",
                 "2", "--netwidth_fine", "32", "--N_samples", "16",
                 "--N_importance", "16"]
    ncfg = parse_args(base, stage="nerf")

    # ---------------------------------------------------- NeRF render PSNR
    scene = load_scene(ncfg, stage="nerf")
    model, params = create_nerfh(ncfg, jax.random.PRNGKey(0))
    if args.nerf_ckpt:
        loaded = port_nerf(args.nerf_ckpt, D=ncfg.netdepth)
        for k in params:
            if k not in loaded:
                print(f"[port] NeRF ckpt lacks '{k}' — fresh init kept")
                loaded[k] = params[k]
        params = loaded
        print(f"[port] NeRF-H weights from {args.nerf_ckpt}")
    elif args.dryrun:
        print("[dryrun] random-init NeRF (protocol check only)")
    settings = render_settings(ncfg, scene.near, scene.far, test=True)
    H, W, focal = scene.H, scene.W, scene.focal
    render = jax.jit(lambda p, h: render_image(
        params, model, p, h, H, W, focal, settings,
        chunk=min(ncfg.chunk, H * W)))
    split = scene.val
    n_views = len(split)
    if args.max_render_views:
        n_views = min(n_views, args.max_render_views)
    psnrs = []
    for i in range(n_views):
        rgb = np.asarray(render(jnp.asarray(split.poses[i]),
                                jnp.asarray(split.hists[i]))["rgb"])
        mse = float(np.mean((rgb - split.images[i]) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
        print(f"[nerf] view {i + 1}/{n_views}: PSNR {psnrs[-1]:.2f} dB",
              flush=True)
    print(f"[nerf] mean test PSNR: {np.mean(psnrs):.3f} dB "
          "(reference protocol: rendering.py:431-457; paper-scene anchors "
          "in BASELINE.md)")

    # ---------------------------------------------------- DFNet pose error
    fargs = base + ["--model_name", "parity_dfnet", "--DFNet",
                    "--basedir", workdir or "/tmp"]
    if args.dfnet_ckpt:
        fargs += ["--pretrain_model_path", args.dfnet_ckpt]
    fcfg = parse_args(fargs, stage="feature")
    apr_scene = load_scene(fcfg, stage="apr")
    ft = FeatureTrainer(fcfg, apr_scene, nerf=None)
    if not args.dfnet_ckpt:
        print("[dryrun] random-init DFNet (protocol check only)")
    med, mean = ft.eval_median_error(apr_scene.val)
    print(f"[dfnet] median error: {med[0]:.4f} m / {med[1]:.3f} deg; "
          f"mean: {mean[0]:.4f} m / {mean[1]:.3f} deg")
    print("[dfnet] compare against the paper tables (BASELINE.md: median "
          "within 1 cm / 0.2 deg of the reference checkpoint's numbers)")
    print("PARITY PROTOCOL COMPLETE")


def _make_dryrun_fixture(root, scene="heads", n_frames=6, H=64, W=64):
    """Miniature MSR-layout 7-Scenes replica (mirrors the tests'
    fixture). 64 px sides so the default --df 2 leaves >= 32 px for the
    DFNet eval's VGG (five 2x2 pools)."""
    import json

    from PIL import Image

    img_dir = osp.join(root, "deepslam_data", "7Scenes", scene)
    meta_dir = osp.join(root, "7Scenes", scene)
    os.makedirs(meta_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for seq in (1, 2):
        seq_dir = osp.join(img_dir, f"seq-{seq:02d}")
        os.makedirs(seq_dir, exist_ok=True)
        for f in range(n_frames):
            arr = (rng.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                osp.join(seq_dir, f"frame-{f:06d}.color.png"))
            pose = np.eye(4)
            pose[:3, 3] = rng.normal(size=3)
            np.savetxt(osp.join(seq_dir, f"frame-{f:06d}.pose.txt"), pose)
    with open(osp.join(img_dir, "TrainSplit.txt"), "w") as fh:
        fh.write("sequence1\n")
    with open(osp.join(img_dir, "TestSplit.txt"), "w") as fh:
        fh.write("sequence2\n")
    with open(osp.join(meta_dir, "world_setup.json"), "w") as fh:
        json.dump({"near": 0, "far": 2.5, "pose_scale": 1,
                   "pose_scale2": 1,
                   "move_all_cam_vec": [0.0, 0.0, 1.0]}, fh)
    return osp.join(root, "7Scenes", scene)


def _make_dryrun_fixture_cambridge(root, scene="KingsCollege", n_frames=6,
                                   H=64, W=64):
    """Miniature Cambridge-layout replica (rgb/ + poses/ per split,
    world_setup.json at the meta root — load_Cambridge.py:349-476
    layout). 64 px sides so the default --df 2 leaves >= 32 px for VGG."""
    import json

    from PIL import Image

    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        rgb = osp.join(root, "deepslam_data", "Cambridge", scene, split,
                       "rgb")
        poses = osp.join(root, "deepslam_data", "Cambridge", scene, split,
                         "poses")
        os.makedirs(rgb, exist_ok=True)
        os.makedirs(poses, exist_ok=True)
        for i in range(n_frames):
            arr = (rng.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(osp.join(rgb, f"frame{i:05d}.png"))
            pose = np.eye(4)
            pose[:3, 3] = rng.normal(size=3)
            np.savetxt(osp.join(poses, f"frame{i:05d}.txt"), pose)
    meta = osp.join(root, "Cambridge", scene)
    os.makedirs(meta, exist_ok=True)
    with open(osp.join(meta, "world_setup.json"), "w") as fh:
        json.dump({"near": 0.2, "far": 10, "pose_scale": 0.5,
                   "pose_scale2": 1,
                   "move_all_cam_vec": [0.0, 0.0, 0.0]}, fh)
    return osp.join(root, "Cambridge", scene)


if __name__ == "__main__":
    main()
