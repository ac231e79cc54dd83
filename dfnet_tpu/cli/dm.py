"""Stage 3 CLI — DFNet_dm direct-feature-matching fine-tuning / eval.

Drop-in surface for the reference's `python train.py --config
config_dfnetdm.txt` (reference: /root/reference/script/train.py). With
`finetune_unlabel` + combine_loss_w=[0,0,1] this is self-supervised
adaptation on the test sequences, model-selected by val PSNR. `--eval`
reports median/mean pose error of a trained checkpoint.
"""

import os.path as osp


import numpy as np

from dfnet_tpu.config import parse_args, apply_runtime_flags
from dfnet_tpu.data.loader import load_scene
from dfnet_tpu.training.dm_trainer import DMTrainer
from dfnet_tpu.training.nerf_renderer import FrozenNeRF

N_EPOCH = 2001  # hardcoded in the reference (direct_feature_matching.py:437)


def _setup(cfg):
    scene = load_scene(cfg, stage="apr")
    print(f"[train] NEAR FAR {scene.near} {scene.far} "
          f"train={len(scene.train)} val={len(scene.val)}")
    from dfnet_tpu.parallel.mesh import mesh_from_config

    mesh = mesh_from_config(cfg)
    if mesh is not None:
        print(f"[train] SPMD over {mesh.devices.size}-device mesh "
              f"(render-at-predicted-pose ray axis)")
    # the reference renders stage-3 at quarter resolution then bicubic-
    # upsamples (half_res=True hardcoded, direct_feature_matching.py:414,341-348)
    nerf_cfg = cfg.replace(tinyimg=True, tinyscale=4.0)
    nerf = FrozenNeRF.from_experiment(
        nerf_cfg, scene.hwf, scene.near, scene.far, scene.world_setup,
        mesh=mesh)
    return scene, nerf


def train(argv=None):
    cfg = parse_args(argv, stage="dm")
    apply_runtime_flags(cfg)
    scene, nerf = _setup(cfg)
    trainer = DMTrainer(cfg, scene, nerf)
    rng = np.random.default_rng(cfg.rng_seed)

    from dfnet_tpu.utils.metrics_logger import MetricsLogger

    mlog = MetricsLogger(osp.join(cfg.basedir, cfg.model_name or "dfnetdm"))
    n_epoch = min(N_EPOCH, cfg.epochs + 1)
    for epoch in range(n_epoch):
        loss, psnr = trainer.train_epoch(rng)
        val_loss, val_psnr = trainer.eval_epoch()
        mlog.log(epoch, train_loss=loss, train_psnr=psnr,
                 val_loss=val_loss, val_psnr=val_psnr)
        print(f"At epoch {epoch:4d} : train loss: {loss:.4f}, train psnr: "
              f"{psnr:.4f}, val loss: {val_loss:.4f}, val psnr: {val_psnr:.4f}")
        trainer.early_stopping(val_loss, trainer.checkpoint_tree(), epoch=epoch,
                               save_multiple=(not cfg.no_save_multiple),
                               save_all=cfg.save_all_ckpt, val_psnr=val_psnr)
        if trainer.early_stopping.early_stop:
            print("Early stopping")
            break
        if epoch % cfg.i_eval == 0:
            trainer.eval_median_error(scene.val)


def evaluate(argv=None):
    cfg = parse_args(argv, stage="dm")
    apply_runtime_flags(cfg)
    scene = load_scene(cfg, stage="apr")
    from dfnet_tpu.training.feature_trainer import load_dfnet_params
    from dfnet_tpu.models.dfnet import DFNetConfig, dfnet_forward
    import jax

    mcfg = DFNetConfig.small() if cfg.DFNet_s else DFNetConfig()
    params, state = load_dfnet_params(cfg.pretrain_model_path, mcfg)

    @jax.jit
    def predict12(images):
        _, pose12, _ = dfnet_forward(params, state, images, mcfg,
                                     return_feature=False,
                                     upsample_h=scene.H, upsample_w=scene.W)
        return pose12

    from dfnet_tpu.training.eval_pose import get_error_in_q

    print(len(scene.val))
    get_error_in_q(predict12, scene.val)


def main(argv=None):
    # eval can come from the CLI or from eval=True inside the config file
    if parse_args(argv, stage="dm").eval:
        np.random.seed(0)
        evaluate(argv)
    else:
        train(argv)


if __name__ == "__main__":
    main()
