"""End-to-end golden parity vs a reference-faithful torch replica.

The strongest correctness check available without 7-Scenes data: ONE
full stage-1 train step (fixed init, fixed rays, deterministic
sampling) computed by an independent torch-CPU replica of the
reference's train math — PE embedding (run_nerf helpers), NeRF-W MLPs
(nerfw.py:220-354), stratified + inverse-CDF sampling
(rendering.py:24-65,269-302), raw2outputs_NeRFW compositing
(rendering.py:132-243, 1e2 terminal delta, beta_min added after
composition), NerfWLoss (losses.py:19-59) — with loss AND gradients
compared against our jitted f32 path. Plus the stage-3 contract:
d(loss)/d(pose) through get_rays -> render (direct_pose_model's
mechanism) against the torch chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

import dataclasses

from dfnet_tpu.config import parse_args
from dfnet_tpu.convert import nerfw_state_dict_to_params
from dfnet_tpu.models.factory import create_nerfh, render_settings
from dfnet_tpu.models.losses import nerfw_loss
from dfnet_tpu.render.rays import get_rays
from dfnet_tpu.render.volume import render_rays

D, W = 5, 32   # reference skip at layer 4 (nerfw.py skips=[4])
S, S_IMP = 12, 12
N_RAYS = 24
NEAR, FAR = 0.5, 3.5
MULTIRES, MULTIRES_V = 6, 3
HB = 10        # hist bins
IN_A, IN_T = 5, 2


# ---------------------------------------------------------------------------
# torch replica of the reference train math
# ---------------------------------------------------------------------------

def t_embed(x, n_freqs):
    """Reference Embedder: [x, sin(2^k x), cos(2^k x) ...] (nerfw.py:97-130)."""
    out = [x]
    for k in range(n_freqs):
        f = 2.0 ** k
        out += [torch.sin(f * x), torch.cos(f * x)]
    return torch.cat(out, -1)


class TStatic(nn.Module):
    """Coarse NeRF-W (no appearance/transient), reference layer names."""

    def __init__(self, in_xyz, in_dir):
        super().__init__()
        for i in range(D):
            cin = in_xyz if i == 0 else (W + in_xyz if i == 4 else W)
            setattr(self, f"xyz_encoding_{i+1}",
                    nn.Sequential(nn.Linear(cin, W), nn.ReLU(True)))
        self.xyz_encoding_final = nn.Linear(W, W)
        self.dir_encoding = nn.Sequential(nn.Linear(W + in_dir, W // 2),
                                          nn.ReLU(True))
        self.static_sigma = nn.Sequential(nn.Linear(W, 1), nn.Softplus())
        self.static_rgb = nn.Sequential(nn.Linear(W // 2, 3), nn.Sigmoid())

    def forward(self, xyz, d):
        h = xyz
        for i in range(D):
            if i == 4:
                h = torch.cat([xyz, h], -1)
            h = getattr(self, f"xyz_encoding_{i+1}")(h)
        sigma = self.static_sigma(h)
        hf = self.xyz_encoding_final(h)
        rgb = self.static_rgb(self.dir_encoding(torch.cat([hf, d], -1)))
        return torch.cat([rgb, sigma], -1)


class TFine(nn.Module):
    """Fine NeRF-W with appearance + transient, reference layer names."""

    def __init__(self, in_xyz, in_dir):
        super().__init__()
        for i in range(D):
            cin = in_xyz if i == 0 else (W + in_xyz if i == 4 else W)
            setattr(self, f"xyz_encoding_{i+1}",
                    nn.Sequential(nn.Linear(cin, W), nn.ReLU(True)))
        self.xyz_encoding_final = nn.Linear(W, W)
        self.dir_encoding = nn.Sequential(
            nn.Linear(W + in_dir + HB * IN_A, W // 2), nn.ReLU(True))
        self.static_sigma = nn.Sequential(nn.Linear(W, 1), nn.Softplus())
        self.static_rgb = nn.Sequential(nn.Linear(W // 2, 3), nn.Sigmoid())
        self.transient_encoding = nn.Sequential(
            nn.Linear(W + HB * IN_T, W // 2), nn.ReLU(True),
            nn.Linear(W // 2, W // 2), nn.ReLU(True),
            nn.Linear(W // 2, W // 2), nn.ReLU(True),
            nn.Linear(W // 2, W // 2), nn.ReLU(True))
        self.transient_sigma = nn.Sequential(nn.Linear(W // 2, 1),
                                             nn.Softplus())
        self.transient_rgb = nn.Sequential(nn.Linear(W // 2, 3), nn.Sigmoid())
        self.transient_beta = nn.Sequential(nn.Linear(W // 2, 1),
                                            nn.Softplus())

    def forward(self, xyz, d, a, t):
        h = xyz
        for i in range(D):
            if i == 4:
                h = torch.cat([xyz, h], -1)
            h = getattr(self, f"xyz_encoding_{i+1}")(h)
        sigma = self.static_sigma(h)
        hf = self.xyz_encoding_final(h)
        dd = self.dir_encoding(torch.cat([hf, d, a], -1))
        rgb = self.static_rgb(dd)
        tt = self.transient_encoding(torch.cat([hf, t], -1))
        return torch.cat([rgb, sigma, self.transient_rgb(tt),
                          self.transient_sigma(tt),
                          self.transient_beta(tt)], -1)


def t_shifted_cumprod(alphas):
    shifted = torch.cat([torch.ones_like(alphas[:, :1]),
                         1.0 - alphas[:, :-1]], -1)
    return torch.cumprod(shifted, -1)


def t_composite_static(raw, z_vals):
    """raw2outputs_NeRFW, output_transient=False (rendering.py:132-243)."""
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = torch.cat([deltas, 1e2 * torch.ones_like(deltas[:, :1])], -1)
    rgbs, sigmas = raw[..., :3], raw[..., 3]
    alphas = 1.0 - torch.exp(-deltas * sigmas)
    trans = t_shifted_cumprod(alphas)
    weights = alphas * trans
    rgb_map = (weights[..., None] * rgbs).sum(-2)
    return rgb_map, weights


def t_composite_transient(raw, z_vals, beta_min):
    """raw2outputs_NeRFW, output_transient=True, train time."""
    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = torch.cat([deltas, 1e2 * torch.ones_like(deltas[:, :1])], -1)
    s_rgb, s_sig = raw[..., :3], raw[..., 3]
    t_rgb, t_sig, t_beta = raw[..., 4:7], raw[..., 7], raw[..., 8]
    s_a = 1.0 - torch.exp(-deltas * s_sig)
    t_a = 1.0 - torch.exp(-deltas * t_sig)
    alphas = 1.0 - torch.exp(-deltas * (s_sig + t_sig))
    trans = t_shifted_cumprod(alphas)
    rgb_map = ((s_a * trans)[..., None] * s_rgb).sum(-2) \
        + ((t_a * trans)[..., None] * t_rgb).sum(-2)
    beta = (t_a * trans * t_beta).sum(-1) + beta_min
    return rgb_map, beta, t_sig


def t_sample_pdf(bins, weights, n_imp):
    """Deterministic inverse-CDF sampling (rendering.py:24-65, det)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[:, :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, n_imp).expand(cdf.shape[0], n_imp)
    inds = torch.searchsorted(cdf.contiguous(), u.contiguous(), right=True)
    below = (inds - 1).clamp(min=0)
    above = inds.clamp(max=cdf.shape[-1] - 1)
    cdf_b = torch.gather(cdf, 1, below)
    cdf_a = torch.gather(cdf, 1, above)
    bins_b = torch.gather(bins, 1, below.clamp(max=bins.shape[-1] - 1))
    bins_a = torch.gather(bins, 1, above.clamp(max=bins.shape[-1] - 1))
    denom = cdf_a - cdf_b
    denom[denom < 1e-5] = 1.0
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)


def t_render(coarse, fine, emb_a, emb_t, rays_o, rays_d, hist):
    """Full coarse->fine reference pipeline (rendering.py:245-337),
    deterministic (perturb=0)."""
    n = rays_o.shape[0]
    viewdirs = rays_d / rays_d.norm(dim=-1, keepdim=True)
    tt = torch.linspace(0.0, 1.0, S)
    z_vals = NEAR * (1.0 - tt) + FAR * tt
    z_vals = z_vals.expand(n, S)
    pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    d_emb = t_embed(viewdirs, MULTIRES_V)
    raw_c = coarse(t_embed(pts, MULTIRES).reshape(n * S, -1),
                   d_emb[:, None].expand(n, S, d_emb.shape[-1])
                   .reshape(n * S, -1)).reshape(n, S, 4)
    rgb0, weights = t_composite_static(raw_c, z_vals)

    z_mid = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
    z_samp = t_sample_pdf(z_mid, weights[:, 1:-1].detach(), S_IMP)
    z_all, _ = torch.sort(torch.cat([z_vals, z_samp.detach()], -1), -1)
    pts_f = rays_o[:, None] + rays_d[:, None] * z_all[..., None]
    a = emb_a(hist).reshape(n, -1)
    t_ = emb_t(hist).reshape(n, -1)
    Sf = S + S_IMP
    raw_f = fine(
        t_embed(pts_f, MULTIRES).reshape(n * Sf, -1),
        d_emb[:, None].expand(n, Sf, d_emb.shape[-1]).reshape(n * Sf, -1),
        a[:, None].expand(n, Sf, a.shape[-1]).reshape(n * Sf, -1),
        t_[:, None].expand(n, Sf, t_.shape[-1]).reshape(n * Sf, -1),
    ).reshape(n, Sf, 9)
    rgb, beta, t_sig = t_composite_transient(raw_f, z_all, beta_min=0.1)
    return rgb0, rgb, beta, t_sig


def t_loss(rgb0, rgb, beta, t_sig, target, lambda_u=0.01):
    """NerfWLoss (losses.py:19-59)."""
    c_l = 0.5 * ((rgb0 - target) ** 2).mean()
    f_l = (((rgb - target) ** 2) / (2.0 * beta[:, None] ** 2)).mean()
    b_l = 3.0 + torch.log(beta).mean()
    s_l = lambda_u * t_sig.mean()
    return c_l + f_l + b_l + s_l


# ---------------------------------------------------------------------------
# fixture: paired torch/jax models
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def paired():
    torch.manual_seed(0)
    in_xyz = 3 + 6 * MULTIRES
    in_dir = 3 + 6 * MULTIRES_V
    coarse = TStatic(in_xyz, in_dir)
    fine = TFine(in_xyz, in_dir)
    emb_a = nn.Embedding(100, IN_A)
    emb_t = nn.Embedding(100, IN_T)

    cfg = parse_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--netdepth", str(D), "--netwidth", str(W),
        "--netdepth_fine", str(D), "--netwidth_fine", str(W),
        "--N_samples", str(S), "--N_importance", str(S_IMP),
        "--multires", str(MULTIRES), "--multires_views", str(MULTIRES_V),
        "--proposal", "False",
    ], stage="nerf")
    model, _ = create_nerfh(cfg, jax.random.PRNGKey(0))
    params = {
        "coarse": nerfw_state_dict_to_params(coarse.state_dict(), D=D),
        "fine": nerfw_state_dict_to_params(fine.state_dict(), D=D,
                                           encode_transient=True),
        "embedding_a": np.asarray(emb_a.weight.detach().numpy()),
        "embedding_t": np.asarray(emb_t.weight.detach().numpy()),
    }
    params = jax.tree.map(jnp.asarray, params)
    settings = dataclasses.replace(render_settings(cfg, NEAR, FAR),
                                   perturb=0.0)
    return cfg, model, params, settings, coarse, fine, emb_a, emb_t


def _data():
    g = torch.Generator().manual_seed(1)
    ro = torch.randn(N_RAYS, 3, generator=g) * 0.1
    rd = torch.randn(N_RAYS, 3, generator=g)
    rd = rd / rd.norm(dim=-1, keepdim=True)
    hist = torch.randint(0, 100, (N_RAYS, HB), generator=g)
    target = torch.rand(N_RAYS, 3, generator=g)
    return ro, rd, hist, target


def test_stage1_step_golden(paired):
    cfg, model, params, settings, coarse, fine, emb_a, emb_t = paired
    ro, rd, hist, target = _data()

    # ---- torch side: loss + grads
    out = t_render(coarse, fine, emb_a, emb_t, ro, rd, hist)
    loss_t = t_loss(*out, target)
    loss_t.backward()

    # ---- jax side
    def loss_fn(p):
        res = render_rays(p, model, jnp.asarray(ro.numpy()),
                          jnp.asarray(rd.numpy()),
                          jnp.asarray(hist.numpy()), settings, rng=None)
        return sum(nerfw_loss(res, jnp.asarray(target.numpy())).values())

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(loss_j) - float(loss_t)) < 2e-4, (
        f"loss: jax {float(loss_j)} vs torch {float(loss_t)}")

    def check(gj, gt, name):
        gj = np.asarray(gj)
        gt = gt.detach().numpy()
        if gt.ndim == 2 and gj.shape == gt.T.shape:
            gt = gt.T                      # torch Linear stores (out, in)
        scale = max(np.abs(gt).max(), 1e-8)
        err = np.abs(gj - gt).max() / scale
        assert err < 2e-3, f"{name}: rel grad err {err:.5f}"

    check(grads["coarse"]["xyz_0"]["w"],
          coarse.xyz_encoding_1[0].weight.grad, "coarse xyz_0 w")
    check(grads["coarse"]["static_sigma"]["b"],
          coarse.static_sigma[0].bias.grad, "coarse sigma b")
    check(grads["fine"]["xyz_0"]["w"],
          fine.xyz_encoding_1[0].weight.grad, "fine xyz_0 w")
    check(grads["fine"]["xyz_4"]["w"],
          fine.xyz_encoding_5[0].weight.grad, "fine skip-layer w")
    check(grads["fine"]["dir"]["w"],
          fine.dir_encoding[0].weight.grad, "fine dir w")
    check(grads["fine"]["trans_2"]["w"],
          fine.transient_encoding[4].weight.grad, "fine trans_2 w")
    check(grads["fine"]["trans_beta"]["w"],
          fine.transient_beta[0].weight.grad, "fine beta head w")
    check(grads["embedding_a"], emb_a.weight.grad, "embedding_a")
    check(grads["embedding_t"], emb_t.weight.grad, "embedding_t")


def test_stage2_rvs_step_golden(tmp_path):
    """ONE full stage-2 RVS train step pinned against a torch replica of
    the reference composite (run_feature.py:166-230 + misc.py:399-435):
    siamese DFNet forward, hard-negative-mining-plus triplet, RVS pose
    loss, 3-way combine_loss_w sum, frozen-BN semantics
    (utils.py:18-40 = eval-mode stats AND no grads on BN affine).
    Loss AND parameter grads compared; then the real jitted step is run
    and must reproduce the loss and leave BN affine untouched."""
    import tempfile, os
    from test_torch_parity import _TorchDFNet
    from dfnet_tpu.config import parse_args as parse_feature_args
    from dfnet_tpu.convert import convert_dfnet_checkpoint
    from dfnet_tpu.data.synthetic import make_synthetic_scene
    from dfnet_tpu.training.feature_trainer import FeatureTrainer

    B, H, Wimg = 4, 32, 48
    margin, w3 = 1.0, (0.3, 0.4, 0.5)
    torch.manual_seed(3)
    tnet = _TorchDFNet()
    tnet.train()
    for m in tnet.modules():
        if isinstance(m, nn.BatchNorm2d):
            # freeze_bn_layer + freeze_bn_layer_train combined
            m.eval()
            m.weight.requires_grad_(False)
            m.bias.requires_grad_(False)

    g = torch.Generator().manual_seed(4)
    t_imgs = torch.rand(B, 3, H, Wimg, generator=g)
    r_imgs = torch.rand(B, 3, H, Wimg, generator=g)
    v_imgs = torch.rand(B, 3, H, Wimg, generator=g)
    poses = torch.randn(B, 12, generator=g)
    poses_p = torch.randn(B, 12, generator=g)

    # ---- torch step (reference train_on_batch_with_random_view_synthesis)
    feats, pose_pred = tnet(torch.cat([t_imgs, r_imgs]), upsample=(H, Wimg))
    f_t, f_r = feats[:, :B], feats[:, B:]
    mse = nn.MSELoss()
    loss_pose = mse(pose_pred, torch.cat([poses, poses]))

    # misc.py:399-435 verbatim semantics
    crit = nn.TripletMarginLoss(margin=margin)
    anchor, positive = f_r, f_t
    anchor_neg = torch.roll(f_r, 1, dims=1)
    negative = torch.roll(f_t, 1, dims=1)
    with torch.no_grad():
        cases = torch.stack([mse(anchor, negative), mse(positive, anchor_neg),
                             mse(anchor, anchor_neg), mse(positive, negative)])
        which = int(torch.argmin(cases))
    loss_f = [lambda: crit(anchor, positive, negative),
              lambda: crit(positive, anchor, anchor_neg),
              lambda: crit(anchor, positive, anchor_neg),
              lambda: crit(positive, anchor, negative)][which]()

    _, virtue_pose = tnet(v_imgs, upsample=(H, Wimg))
    loss_rvs = mse(virtue_pose, poses_p)
    loss_t = w3[0] * loss_pose + w3[1] * loss_f + w3[2] * loss_rvs
    loss_t.backward()

    # ---- jax side: the actual FeatureTrainer step machinery
    with tempfile.TemporaryDirectory() as d:
        pt = os.path.join(d, "ckpt.pt")
        torch.save(tnet.state_dict(), pt)
        t_params, t_state = convert_dfnet_checkpoint(pt)
    scene = make_synthetic_scene(n_train=B, n_val=2, H=H, W=Wimg,
                                 focal=40.0, seed=0)
    cfg = parse_feature_args([
        "--NeRFH", "--encode_hist", "--dataset_type", "synthetic",
        "--DFNet", "--tripletloss", "--freezeBN",
        "--random_view_synthesis", "--triplet_ref_axis", "True",
        "--triplet_margin", str(margin),
        "--combine_loss_w", "0.3,0.4,0.5",
        "--feature_precision", "fp32",
        "--featurenet_batch_size", str(B),
        "--basedir", str(tmp_path), "--expname", "nerfh",
        "--model_name", "dfnet",
    ], stage="feature")
    trainer = FeatureTrainer(cfg, scene, nerf=None)
    params = jax.tree.map(jnp.asarray, t_params)
    state = jax.tree.map(jnp.asarray, t_state)
    to_nhwc = lambda x: jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    batch = (to_nhwc(t_imgs), to_nhwc(r_imgs), jnp.asarray(poses.numpy()),
             to_nhwc(v_imgs), jnp.asarray(poses_p.numpy()))

    loss_j, grads = jax.value_and_grad(
        lambda p: trainer._loss_fn(p, state, *batch)[0])(params)
    assert abs(float(loss_j) - float(loss_t)) < 2e-4, (
        f"loss: jax {float(loss_j)} vs torch {float(loss_t)}")

    def check(gj, gt, name, tol=2e-3):
        gj = np.asarray(gj)
        gt = gt.detach().numpy()
        if gt.ndim == 4:                   # torch conv (out,in,kh,kw)
            gt = gt.transpose(2, 3, 1, 0)
        elif gt.ndim == 2 and gj.shape == gt.T.shape:
            gt = gt.T
        scale = max(np.abs(gt).max(), 1e-8)
        err = np.abs(gj - gt).max() / scale
        assert err < tol, f"{name}: rel grad err {err:.5f}"

    check(grads["encoder"]["conv1_1"]["w"], tnet.encoder[0].weight.grad,
          "encoder conv1_1 w")
    check(grads["encoder"]["conv5_3"]["w"], tnet.encoder[28].weight.grad,
          "encoder conv5_3 w")
    check(grads["encoder"]["conv5_3"]["b"], tnet.encoder[28].bias.grad,
          "encoder conv5_3 b")
    a0 = tnet.adaptation_layers.adapt_layer_0
    a2 = tnet.adaptation_layers.adapt_layer_2
    check(grads["adapt"]["0"]["conv1"]["w"], a0[0].weight.grad, "adapt0 conv1 w")
    check(grads["adapt"]["0"]["conv2"]["w"], a0[2].weight.grad, "adapt0 conv2 w")
    # level 2 (conv5_3 tap): f_t ≈ f_r — deep responses of two images are
    # dominated by the shared DC response, so the triplet's f_r−f_t is a
    # tiny difference of large near-equal values. f32 cancellation puts a
    # ~1e-2 relative noise floor on this branch's grads (measured: the
    # isolated triplet, resize-transpose, and forward all agree to 1e-7;
    # a wrong case/axis/mode produces O(1) errors, still caught here).
    check(grads["adapt"]["2"]["conv1"]["w"], a2[0].weight.grad,
          "adapt2 conv1 w", tol=2e-2)
    check(grads["adapt"]["2"]["conv2"]["w"], a2[2].weight.grad,
          "adapt2 conv2 w", tol=5e-2)
    # conv2 bias shifts BOTH siamese streams equally → cancels in every
    # pairwise distance: its true grad is zero (both sides agree on ~0)
    assert np.abs(np.asarray(grads["adapt"]["2"]["conv2"]["b"])).max() < 1e-6
    assert a2[2].bias.grad.abs().max().item() < 1e-6
    check(grads["fc_pose"]["w"], tnet.fc_pose.weight.grad, "fc_pose w")
    check(grads["fc_pose"]["b"], tnet.fc_pose.bias.grad, "fc_pose b")

    # ---- the real jitted step: same loss, BN affine untouched (the
    # reference's requires_grad_(False) == our masked grads)
    bn_before = np.asarray(params["adapt"]["0"]["bn_scale"])
    new_params, _, _, loss_step = trainer._step(
        params, state, trainer.optimizer.init(params), *batch,
        cfg.learning_rate)
    assert abs(float(loss_step) - float(loss_t)) < 2e-4
    np.testing.assert_array_equal(
        bn_before, np.asarray(new_params["adapt"]["0"]["bn_scale"]))


def test_stage3_pose_grad_golden(paired):
    """d(loss)/d(pose) through get_rays -> render: the stage-3 gradient
    mechanism (reference dm/direct_pose_model.py train_nerf_tracking's
    photometric mode)."""
    cfg, model, params, settings, coarse, fine, emb_a, emb_t = paired
    Hh, Ww, focal = 6, 8, 8.0
    g = torch.Generator().manual_seed(2)
    pose_t = torch.tensor([[1.0, 0, 0, 0.05], [0, 1.0, 0, -0.02],
                           [0, 0, 1.0, 2.0]], requires_grad=True)
    hist = torch.randint(0, 100, (Hh * Ww, HB), generator=g)
    target = torch.rand(Hh * Ww, 3, generator=g)

    # torch: reference get_rays (ray_utils.py) + render + MSE
    i, j = torch.meshgrid(torch.arange(Ww, dtype=torch.float32),
                          torch.arange(Hh, dtype=torch.float32),
                          indexing="xy")
    dirs = torch.stack([(i - Ww * 0.5) / focal, -(j - Hh * 0.5) / focal,
                        -torch.ones_like(i)], -1)
    rd = (dirs[..., None, :] * pose_t[:3, :3]).sum(-1).reshape(-1, 3)
    ro = pose_t[:3, -1].expand(Hh * Ww, 3)
    _, rgb, beta, _ = t_render(coarse, fine, emb_a, emb_t, ro, rd, hist)
    ((rgb - target) ** 2).mean().backward()
    dpose_t = pose_t.grad.detach().numpy()

    # jax: same chain through our get_rays + render_rays
    def loss_fn(pose):
        ro_, rd_ = get_rays(Hh, Ww, focal, pose)
        res = render_rays(params, model, ro_.reshape(-1, 3),
                          rd_.reshape(-1, 3), jnp.asarray(hist.numpy()),
                          settings, rng=None)
        return jnp.mean((res["rgb"] - jnp.asarray(target.numpy())) ** 2)

    dpose_j = np.asarray(jax.grad(loss_fn)(jnp.asarray(pose_t.detach()
                                                       .numpy())))
    scale = max(np.abs(dpose_t).max(), 1e-8)
    assert np.abs(dpose_j - dpose_t).max() / scale < 2e-3, (
        f"pose grad mismatch:\n{dpose_j}\nvs\n{dpose_t}")
