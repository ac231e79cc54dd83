"""Stage 2 CLI — train/evaluate DFNet (feature extractor + pose regressor).

Drop-in surface for the reference's `python run_feature.py --config
config_dfnet.txt` (reference: /root/reference/script/run_feature.py).
`--eval` reports median/mean pose error from a pretrained checkpoint.
"""

import os
import os.path as osp


import numpy as np

from dfnet_tpu.config import parse_args, apply_runtime_flags
from dfnet_tpu.data.loader import load_scene
from dfnet_tpu.training.feature_trainer import FeatureTrainer
from dfnet_tpu.training.nerf_renderer import FrozenNeRF


def dump_args(cfg):
    expdir = osp.join(cfg.basedir, cfg.expname)
    os.makedirs(expdir, exist_ok=True)
    with open(osp.join(expdir, "args.txt"), "w") as fh:
        for k in sorted(vars(cfg)):
            fh.write(f"{k} = {getattr(cfg, k)}\n")


def render_features(cfg, scene, trainer, out_root="./tmp/features"):
    """Dump per-view saliency maps of DFNet features for real vs rendered
    images (reference: run_feature.py:313-346 --render_feature_only)."""
    import jax.numpy as jnp

    from dfnet_tpu.models.dfnet import dfnet_forward
    from dfnet_tpu.utils.visualization import save_image_saliancy_single

    rgbs = trainer.prerender_train_views()
    tr = scene.train
    for sub in ("target", "rgb"):
        os.makedirs(osp.join(out_root, sub), exist_ok=True)
    save_i = 2  # feature channel to dump
    for i in range(len(tr)):
        x = jnp.stack([jnp.asarray(tr.images[i]), jnp.asarray(rgbs[i])])
        feats, _, _ = dfnet_forward(
            trainer.params, trainer.state, x, trainer.model_cfg,
            return_feature=True, is_single_stream=False, return_pose=False,
            upsample_h=scene.H, upsample_w=scene.W)
        ft = feats[0][0, 0, :, :, save_i]
        fr = feats[1][0, 0, :, :, save_i]
        save_image_saliancy_single(ft, osp.join(out_root, "target", f"{i:04d}.png"))
        save_image_saliancy_single(fr, osp.join(out_root, "rgb", f"{i:04d}.png"))
    print("render features done")


def train(argv=None):
    cfg = parse_args(argv, stage="feature")
    apply_runtime_flags(cfg)
    if cfg.dataset_type not in ("7Scenes", "Cambridge", "synthetic"):
        print("Unknown dataset type", cfg.dataset_type, "exiting")
        return
    scene = load_scene(cfg, stage="apr")
    print(f"[run_feature] NEAR FAR {scene.near} {scene.far} "
          f"train={len(scene.train)} val={len(scene.val)}")

    from dfnet_tpu.parallel.mesh import mesh_from_config

    mesh = mesh_from_config(cfg)
    if mesh is not None:
        print(f"[run_feature] SPMD over {mesh.devices.size}-device mesh")
    nerf = None
    if not cfg.eval:
        nerf = FrozenNeRF.from_experiment(
            cfg, scene.hwf, scene.near, scene.far, scene.world_setup,
            mesh=mesh)
    trainer = FeatureTrainer(cfg, scene, nerf, mesh=mesh)

    if cfg.eval:
        trainer.eval_median_error(scene.val)
        return

    if cfg.render_feature_only:
        render_features(cfg, scene, trainer)
        return

    dump_args(cfg)
    targets = scene.train.images
    rgbs = trainer.prerender_train_views()

    from dfnet_tpu.utils.metrics_logger import MetricsLogger

    mlog = MetricsLogger(osp.join(cfg.basedir, cfg.model_name or "dfnet"))
    rng = np.random.default_rng(cfg.rng_seed)
    poses_perturb = virtue_view = None
    for epoch in range(cfg.epochs + 1):
        if cfg.random_view_synthesis and epoch % cfg.rvs_refresh_rate == 0:
            poses_perturb, virtue_view = trainer.rvs_refresh(rng)
        train_loss = trainer.train_epoch(targets, rgbs, virtue_view,
                                         poses_perturb, rng)
        val_loss = trainer.validate()
        trainer.scheduler.step(val_loss)
        print(f"At epoch {epoch:6d} : train loss: {train_loss:.4f}, "
              f"val loss: {val_loss:.4f}")
        mlog.log(epoch, train_loss=train_loss, val_loss=val_loss,
                 lr=trainer.scheduler.lr)
        trainer.early_stopping(val_loss, trainer.checkpoint_tree(), epoch=epoch,
                               save_multiple=(not cfg.no_save_multiple),
                               save_all=cfg.save_all_ckpt)
        if trainer.early_stopping.early_stop:
            print("Early stopping")
            break
        if epoch % cfg.i_eval == 0:
            trainer.eval_median_error(scene.val)


main = train

if __name__ == "__main__":
    main()
