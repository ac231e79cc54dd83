"""Stage 1 CLI — train/evaluate the Histogram-assisted NeRF.

Drop-in surface for the reference's `python run_nerf.py --config
config_nerfh.txt` (reference: /root/reference/script/run_nerf.py), with
the same config files. `--render_test` renders the train/val splits and
reports mean PSNR instead of training.
"""

import os
import os.path as osp
import time


from dfnet_tpu.config import parse_args, apply_runtime_flags
from dfnet_tpu.data.loader import load_scene
from dfnet_tpu.training.nerf_trainer import NeRFTrainer, exp_decayed_lr


def dump_args(cfg):
    expdir = osp.join(cfg.basedir, cfg.expname)
    os.makedirs(expdir, exist_ok=True)
    with open(osp.join(expdir, "args.txt"), "w") as fh:
        for k in sorted(vars(cfg)):
            fh.write(f"{k} = {getattr(cfg, k)}\n")
    if cfg.config:
        with open(osp.join(expdir, "config.txt"), "w") as fh:
            fh.write(open(cfg.config).read())


def train(argv=None):
    cfg = parse_args(argv, stage="nerf")
    apply_runtime_flags(cfg)
    print(f"[run_nerf] dataset={cfg.dataset_type} datadir={cfg.datadir}")
    scene = load_scene(cfg, stage="nerf")
    print(f"[run_nerf] NEAR FAR {scene.near} {scene.far} "
          f"train={len(scene.train)} val={len(scene.val)} hwf={scene.hwf}")

    from dfnet_tpu.parallel.mesh import mesh_from_config

    mesh = mesh_from_config(cfg)
    if mesh is not None:
        print(f"[run_nerf] SPMD over {mesh.devices.size}-device mesh")
    trainer = NeRFTrainer(cfg, scene, mesh=mesh)
    start = trainer.try_resume()

    if cfg.render_pose_only:
        # spiral video path from a random anchor view (reference
        # --render_pose_only; load_7Scenes.py:199-236)
        import numpy as np
        import jax.numpy as jnp

        from dfnet_tpu.data.view_selection import generate_render_pose
        from dfnet_tpu.training.nerf_trainer import write_video

        poses = generate_render_pose(
            scene.train.poses, np.array([scene.near, scene.far]),
            rng=np.random.default_rng(cfg.rng_seed))
        frames = []
        hist = jnp.asarray(scene.train.hists[0])
        for c2w in poses:
            out = trainer._render(trainer.params,
                                  jnp.asarray(c2w, jnp.float32), hist,
                                  jnp.float32(start))
            frames.append(np.asarray(out["rgb"]))
        expdir = osp.join(cfg.basedir, cfg.expname)
        os.makedirs(expdir, exist_ok=True)
        path = write_video(osp.join(expdir, f"spiral_{start:06d}"),
                           np.stack(frames))
        print("Saved spiral render video to", path)
        return None

    if cfg.render_test:
        expdir = osp.join(cfg.basedir, cfg.expname)
        tdir = osp.join(expdir, f"evaluate_train_test_{start:06d}")
        vdir = osp.join(expdir, f"evaluate_val_test_{start:06d}")
        vt = (osp.join(expdir, f"{cfg.expname}_trainset_{start:06d}_train")
              if cfg.render_video_train else None)
        vv = (osp.join(expdir, f"{cfg.expname}_test_{start:06d}_test")
              if cfg.render_video_test else None)
        p_train = trainer.render_split(scene.train, savedir=tdir, video_base=vt)
        print(f"Mean PSNR of train run is: {p_train}")
        p_val = trainer.render_split(scene.val, savedir=vdir, video_base=vv)
        print(f"Mean PSNR of this run is: {p_val}")
        return p_val

    dump_args(cfg)
    from dfnet_tpu.utils.metrics_logger import MetricsLogger

    mlog = MetricsLogger(osp.join(cfg.basedir, cfg.expname))
    for epoch in range(start, cfg.epochs + 1):
        t0 = time.time()
        loss, psnr = trainer.train_epoch(epoch)
        dt = time.time() - t0
        mlog.log(epoch, loss=loss, psnr=psnr, lr=exp_decayed_lr(cfg, epoch),
                 epoch_s=dt)
        if epoch % cfg.i_print == 0:
            print(f"[TRAIN] Iter: {epoch} Loss: {loss:.5f}  PSNR: {psnr:.3f}  "
                  f"lr: {exp_decayed_lr(cfg, epoch):.2e}  ({dt:.1f}s)")
        if epoch % cfg.i_weights == 0 and epoch != 0:
            path = trainer.save(epoch)
            print("Saved checkpoints at", path)
        if epoch % cfg.i_testset == 0 and epoch > 0:
            expdir = osp.join(cfg.basedir, cfg.expname)
            p_tr = trainer.render_split(
                scene.train, savedir=osp.join(expdir, f"trainset_{epoch:06d}"),
                stride=10)
            p_val = trainer.render_split(
                scene.val, savedir=osp.join(expdir, f"testset_{epoch:06d}"))
            print(f"[EVAL] epoch {epoch}: train PSNR {p_tr:.3f}, val PSNR {p_val:.3f}")
    return None


main = train

if __name__ == "__main__":
    main()
