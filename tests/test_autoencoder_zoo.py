"""autoencoder_vgg1..7 zoo: shapes + torch golden parity for the
transpose-conv variants (reference feature/model.py:45-390)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from dfnet_tpu.models import autoencoder as ae


def _to_torch_convT(p):
    """(kh,kw,cout,cin) -> torch ConvTranspose2d weight (cin,cout,kh,kw)."""
    w = np.asarray(p["w"]).transpose(3, 2, 0, 1)
    return torch.tensor(w), torch.tensor(np.asarray(p["b"]))


def _to_torch_conv(p):
    w = np.asarray(p["w"]).transpose(3, 2, 0, 1)
    return torch.tensor(w), torch.tensor(np.asarray(p["b"]))


class _TorchVgg1(nn.Module):
    """Reference autoencoder_vgg1 (model.py:45-67)."""

    def __init__(self):
        super().__init__()
        self.encoder = nn.Sequential(
            nn.Conv2d(3, 16, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv2d(16, 32, 3, stride=2, padding=1), nn.ReLU(),
            nn.Conv2d(32, 64, 7))
        self.decoder = nn.Sequential(
            nn.ConvTranspose2d(64, 32, 7), nn.ReLU(),
            nn.ConvTranspose2d(32, 16, 3, stride=2, padding=1,
                               output_padding=1), nn.ReLU(),
            nn.ConvTranspose2d(16, 3, 3, stride=2, padding=1,
                               output_padding=1), nn.Tanh())

    def forward(self, x):
        e = self.encoder(x)
        return e, self.decoder(e)


def test_vgg1_matches_torch():
    params = ae.init_autoencoder_vgg1(jax.random.PRNGKey(0))
    m = _TorchVgg1().eval()
    with torch.no_grad():
        w, b = _to_torch_conv(params["e1"]); m.encoder[0].weight.copy_(w); m.encoder[0].bias.copy_(b)
        w, b = _to_torch_conv(params["e2"]); m.encoder[2].weight.copy_(w); m.encoder[2].bias.copy_(b)
        w, b = _to_torch_conv(params["e3"]); m.encoder[4].weight.copy_(w); m.encoder[4].bias.copy_(b)
        w, b = _to_torch_convT(params["d1"]); m.decoder[0].weight.copy_(w); m.decoder[0].bias.copy_(b)
        w, b = _to_torch_convT(params["d2"]); m.decoder[2].weight.copy_(w); m.decoder[2].bias.copy_(b)
        w, b = _to_torch_convT(params["d3"]); m.decoder[4].weight.copy_(w); m.decoder[4].bias.copy_(b)
    x = np.random.default_rng(0).uniform(-1, 1, (2, 36, 36, 3)).astype(np.float32)
    with torch.no_grad():
        enc_t, dec_t = m(torch.tensor(x.transpose(0, 3, 1, 2)))
    enc_j, dec_j = ae.autoencoder_vgg1(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(enc_j),
                               enc_t.numpy().transpose(0, 2, 3, 1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dec_j),
                               dec_t.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_vgg2_shapes_and_skip():
    params = ae.init_autoencoder_vgg2(jax.random.PRNGKey(1))
    x = jnp.zeros((1, 36, 36, 3))
    none, recon = ae.autoencoder_vgg2(params, x)
    assert none is None and recon.shape == (1, 36, 36, 3)
    assert np.abs(np.asarray(recon)).max() <= 1.0


@pytest.mark.parametrize("variant,n_feat", [(3, 3), (4, 3), (5, 3)])
def test_vgg345_decoder_shapes(variant, n_feat):
    init = getattr(ae, f"init_autoencoder_vgg{variant}")
    fwd = getattr(ae, f"autoencoder_vgg{variant}")
    params = init(jax.random.PRNGKey(variant))
    H = W = 64  # vgg3's transpose strides (2,4,4) need pool-aligned sizes
    x = jnp.zeros((1, H, W, 3))
    feats, recon = fwd(params, x)
    assert len(feats) == n_feat
    assert recon.shape == (1, H, W, 3)
    lim = 1.0 if variant == 3 else None   # tanh vs sigmoid
    r = np.asarray(recon)
    assert np.isfinite(r).all()
    if lim:
        assert np.abs(r).max() <= lim
    if variant == 3:
        assert r.min() >= -1.0
    else:
        assert r.min() >= 0.0


def test_vgg6_vgg7_pooled_features():
    p6 = ae.init_autoencoder_vgg6(jax.random.PRNGKey(6))
    feats, _ = ae.autoencoder_vgg6(p6, jnp.zeros((1, 64, 64, 3)), 48, 48)
    assert len(feats) == 3 and all(f.shape == (1, 48, 48) for f in feats)
    p7 = ae.init_autoencoder_vgg7(jax.random.PRNGKey(7))
    feats7, _ = ae.autoencoder_vgg7(p7, jnp.zeros((1, 64, 64, 3)), 32, 32)
    assert len(feats7) == 3 and all(f.shape == (1, 32, 32) for f in feats7)
