"""Mixed-precision (bf16 compute) DFNet path — stage 2/3.

The conv stacks run in bfloat16 with f32 master weights; BatchNorm
statistics, pooling, pose head and losses stay f32 (models/dfnet.py
compute_dtype). These tests pin:
  - bf16 forward tracks the f32 forward within bf16 rounding,
  - gradients come back f32 on every leaf and are close to f32 grads,
  - the FeatureTrainer step runs end-to-end under feature_precision=bf16
    and BN running stats stay f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfnet_tpu.models.dfnet import DFNetConfig, dfnet_forward, init_dfnet_params


@pytest.fixture(scope="module")
def setup():
    cfg = DFNetConfig()
    key = jax.random.PRNGKey(0)
    params, state = init_dfnet_params(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 48, 64, 3))
    return cfg, params, state, x


def test_bf16_forward_tracks_f32(setup):
    cfg, params, state, x = setup
    f32_feats, f32_pose, _ = dfnet_forward(
        params, state, x, cfg, return_feature=True, is_single_stream=True,
        upsample_h=24, upsample_w=32, train_bn=True)
    bf_feats, bf_pose, _ = dfnet_forward(
        params, state, x, cfg, return_feature=True, is_single_stream=True,
        upsample_h=24, upsample_w=32, train_bn=True,
        compute_dtype=jnp.bfloat16)
    # pose (and anything downstream of pooling) is f32; feature maps
    # ride the compute dtype through the upsample + feature-loss path
    # (the losses accumulate their distance reductions in f32)
    assert bf_pose.dtype == jnp.float32
    assert bf_feats[0].dtype == jnp.bfloat16
    # bf16 has ~3 decimal digits; 13 conv layers compound — relative
    # agreement at the percent level is the expected regime
    ref = float(jnp.max(jnp.abs(f32_pose)))
    assert float(jnp.max(jnp.abs(bf_pose - f32_pose))) < 0.05 * max(ref, 1.0)
    # feature maps are BN-normalized (unit-ish scale)
    err = float(jnp.mean(jnp.abs(bf_feats[0].astype(jnp.float32)
                                 - f32_feats[0])))
    assert err < 0.08, err


def test_bf16_grads_are_f32_and_close(setup):
    cfg, params, state, x = setup

    def loss(p, dt):
        _, pose, _ = dfnet_forward(p, state, x, cfg, return_feature=False,
                                   upsample_h=24, upsample_w=32,
                                   compute_dtype=dt)
        return jnp.mean(pose ** 2)

    g32 = jax.grad(lambda p: loss(p, jnp.float32))(params)
    gbf = jax.grad(lambda p: loss(p, jnp.bfloat16))(params)
    for leaf in jax.tree.leaves(gbf):
        assert leaf.dtype == jnp.float32
    # direction + magnitude agreement per layer (elementwise max-diff is
    # not meaningful for bf16: 13 layers of rounding compound on the
    # earliest layers' tiny gradients)
    # random-init nets put many pre-activations near 0 where bf16
    # rounding flips ReLU masks, and the effect compounds backward —
    # the earliest layer's grads are the noisiest. Trained nets align
    # tighter; convergence parity is validated end-to-end on the TPU
    # by scripts/quality_stage2_precision.py (QUALITY.md).
    for name, min_cos in (("conv5_3", 0.97), ("conv3_1", 0.95),
                          ("conv1_1", 0.85)):
        a = g32["encoder"][name]["w"].ravel()
        b = gbf["encoder"][name]["w"].ravel()
        na, nb = float(jnp.linalg.norm(a)), float(jnp.linalg.norm(b))
        cos = float(jnp.dot(a, b)) / (na * nb + 1e-30)
        assert cos > min_cos, (name, cos)
        assert abs(nb - na) < 0.2 * na, (name, na, nb)


def test_feature_trainer_step_bf16():
    from dfnet_tpu.config import parse_args
    from dfnet_tpu.data.synthetic import make_synthetic_scene
    from dfnet_tpu.training.feature_trainer import FeatureTrainer

    cfg = parse_args([
        "--DFNet_s", "--featurenet_batch_size", "2", "--tripletloss",
        "--dataset_type", "synthetic", "--feature_precision", "bf16",
    ], stage="feature")
    scene = make_synthetic_scene(n_train=4, n_val=2, H=48, W=64,
                                 focal=60.0, seed=0)
    tr = FeatureTrainer(cfg, scene, nerf=None)
    rng = np.random.default_rng(0)
    targets = scene.train.images
    rgbs = targets + 0.01
    loss = tr.train_epoch(targets, rgbs, None, None, rng)
    assert np.isfinite(loss)
    for leaf in jax.tree.leaves(tr.state):
        assert leaf.dtype == jnp.float32
