"""Converters: reference PyTorch checkpoints → dfnet_tpu param pytrees.

Supports the reference's two formats (reference: run_nerf.py:150-167 and
dm/callbacks.py:90-100):
  - NeRF-H `.tar` dicts: network_fn/fine_state_dict + embedding_a/t;
  - DFNet/DFNet_dm `.pt` bare state_dicts (torchvision VGG16 encoder +
    adaptation layers + fc_pose).
Also converts a torchvision vgg16 state_dict (ImageNet weights) for
DFNet initialization. torch is only needed at conversion time.

Weight layout mapping:
  torch Linear weight (out,in)      → ours (in,out)   [transpose]
  torch Conv2d weight (out,in,kh,kw)→ ours (kh,kw,in,out)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t_lin(sd, name):
    return {
        "w": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"]).T),
        "b": np.asarray(sd[f"{name}.bias"]),
    }


def _t_conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    return {
        "w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "b": np.asarray(sd[f"{name}.bias"]),
    }


def _load_torch(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    return obj


def _to_np(sd):
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


# ---------------------------------------------------------------------------
# NeRF-H
# ---------------------------------------------------------------------------

def nerfw_state_dict_to_params(sd: Dict, D: int = 8,
                               encode_transient: bool = False) -> Dict:
    """One NeRFW module's state_dict → our param dict (see
    models/nerfw.py). Reference layer names: nerfw.py:258-295."""
    sd = _to_np(sd)
    p = {}
    for i in range(D):
        p[f"xyz_{i}"] = _t_lin(sd, f"xyz_encoding_{i + 1}.0")
    p["xyz_final"] = _t_lin(sd, "xyz_encoding_final")
    p["dir"] = _t_lin(sd, "dir_encoding.0")
    p["static_sigma"] = _t_lin(sd, "static_sigma.0")
    p["static_rgb"] = _t_lin(sd, "static_rgb.0")
    if encode_transient or any(k.startswith("transient_encoding") for k in sd):
        for i in range(4):
            p[f"trans_{i}"] = _t_lin(sd, f"transient_encoding.{2 * i}")
        p["trans_sigma"] = _t_lin(sd, "transient_sigma.0")
        p["trans_rgb"] = _t_lin(sd, "transient_rgb.0")
        p["trans_beta"] = _t_lin(sd, "transient_beta.0")
    return p


def convert_nerf_checkpoint(tar_path: str, D: int = 8) -> Dict:
    """Reference `.tar` → {'coarse','fine','embedding_a','embedding_t'}
    + {'global_step'}."""
    ckpt = _load_torch(tar_path)
    out = {"coarse": nerfw_state_dict_to_params(ckpt["network_fn_state_dict"], D)}
    if "network_fine_state_dict" in ckpt:
        out["fine"] = nerfw_state_dict_to_params(
            ckpt["network_fine_state_dict"], D, encode_transient=True)
        out["embedding_a"] = np.asarray(
            _to_np(ckpt["embedding_a_state_dict"])["weight"])
        out["embedding_t"] = np.asarray(
            _to_np(ckpt["embedding_t_state_dict"])["weight"])
    return out, {"global_step": int(ckpt.get("global_step", 0))}


# ---------------------------------------------------------------------------
# DFNet / VGG16
# ---------------------------------------------------------------------------

def vgg16_state_dict_to_params(sd: Dict, prefix: str = "") -> Dict:
    """torchvision vgg16 `features` weights → our encoder params.
    Accepts either 'features.{idx}.weight' (torchvision) or
    'encoder.{idx}.weight' (DFNet checkpoints) naming via `prefix`."""
    from dfnet_tpu.models.vgg import CONV_NAMES, TORCH_CONV_INDEX

    sd = _to_np(sd)
    return {
        name: _t_conv(sd, f"{prefix}{TORCH_CONV_INDEX[name]}")
        for name in CONV_NAMES
    }


def convert_vgg16_imagenet(path: str) -> Dict:
    """torchvision vgg16 ImageNet state_dict file → encoder params."""
    sd = _load_torch(path)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return vgg16_state_dict_to_params(sd, prefix="features.")


def convert_dfnet_checkpoint(pt_path: str, n_levels: int = 3):
    """Reference DFNet `.pt` state_dict → (params, state) pytrees."""
    sd = _to_np(_load_torch(pt_path))
    params: Dict = {"encoder": vgg16_state_dict_to_params(sd, prefix="encoder.")}
    state: Dict = {"adapt": {}}
    params["adapt"] = {}
    i = 0
    while f"adaptation_layers.adapt_layer_{i}.0.weight" in sd:
        base = f"adaptation_layers.adapt_layer_{i}"
        params["adapt"][str(i)] = {
            "conv1": _t_conv(sd, f"{base}.0"),
            "conv2": _t_conv(sd, f"{base}.2"),
            "bn_scale": np.asarray(sd[f"{base}.3.weight"]),
            "bn_bias": np.asarray(sd[f"{base}.3.bias"]),
        }
        state["adapt"][str(i)] = {
            "mean": np.asarray(sd[f"{base}.3.running_mean"]),
            "var": np.asarray(sd[f"{base}.3.running_var"]),
        }
        i += 1
    params["fc_pose"] = _t_lin(sd, "fc_pose")
    return params, state


# ---------------------------------------------------------------------------
# Reverse direction: our pytrees → reference torch checkpoint formats.
# Lets a dfnet_tpu-trained model be loaded by the reference code, and
# gives the dress rehearsal (scripts/parity_7scenes.py --dryrun) a
# replica-built checkpoint in the reference's EXACT dict naming to
# round-trip through the forward converters.
# ---------------------------------------------------------------------------

def _rev_lin(sd, name, p):
    import torch

    sd[f"{name}.weight"] = torch.tensor(
        np.ascontiguousarray(np.asarray(p["w"]).T))
    sd[f"{name}.bias"] = torch.tensor(np.asarray(p["b"]))


def _rev_conv(sd, name, p):
    import torch

    w = np.asarray(p["w"])  # (kh,kw,in,out) → (out,in,kh,kw)
    sd[f"{name}.weight"] = torch.tensor(
        np.ascontiguousarray(w.transpose(3, 2, 0, 1)))
    sd[f"{name}.bias"] = torch.tensor(np.asarray(p["b"]))


def nerfw_params_to_state_dict(p: Dict) -> Dict:
    """Inverse of nerfw_state_dict_to_params: our NeRFW param dict →
    reference layer naming (nerfw.py:258-295)."""
    sd: Dict = {}
    D = sum(1 for k in p if k.startswith("xyz_") and k != "xyz_final")
    for i in range(D):
        _rev_lin(sd, f"xyz_encoding_{i + 1}.0", p[f"xyz_{i}"])
    _rev_lin(sd, "xyz_encoding_final", p["xyz_final"])
    _rev_lin(sd, "dir_encoding.0", p["dir"])
    _rev_lin(sd, "static_sigma.0", p["static_sigma"])
    _rev_lin(sd, "static_rgb.0", p["static_rgb"])
    if "trans_sigma" in p:
        for i in range(4):
            _rev_lin(sd, f"transient_encoding.{2 * i}", p[f"trans_{i}"])
        _rev_lin(sd, "transient_sigma.0", p["trans_sigma"])
        _rev_lin(sd, "transient_rgb.0", p["trans_rgb"])
        _rev_lin(sd, "transient_beta.0", p["trans_beta"])
    return sd


def export_nerf_checkpoint(params: Dict, tar_path: str,
                           global_step: int = 0) -> None:
    """Our {'coarse','fine','embedding_a','embedding_t'} pytree → the
    reference's `.tar` dict (exact key set the reference saves/loads,
    nerfw.py:452-472 / run_nerf.py:150-167)."""
    import torch

    ckpt = {
        "global_step": int(global_step),
        "network_fn_state_dict": nerfw_params_to_state_dict(params["coarse"]),
    }
    if "fine" in params:
        ckpt["network_fine_state_dict"] = \
            nerfw_params_to_state_dict(params["fine"])
        ckpt["embedding_a_state_dict"] = {
            "weight": torch.tensor(np.asarray(params["embedding_a"]))}
        ckpt["embedding_t_state_dict"] = {
            "weight": torch.tensor(np.asarray(params["embedding_t"]))}
    torch.save(ckpt, tar_path)


def export_dfnet_checkpoint(params: Dict, state: Dict, pt_path: str) -> None:
    """Our DFNet (params, state) → the reference's `.pt` bare state_dict
    (dm/callbacks.py:90-100 naming: encoder.{idx} / adaptation_layers.
    adapt_layer_{i} / fc_pose)."""
    import torch

    from dfnet_tpu.models.vgg import CONV_NAMES, TORCH_CONV_INDEX

    sd: Dict = {}
    for name in CONV_NAMES:
        _rev_conv(sd, f"encoder.{TORCH_CONV_INDEX[name]}",
                  params["encoder"][name])
    for i in sorted(params["adapt"], key=int):
        base = f"adaptation_layers.adapt_layer_{i}"
        _rev_conv(sd, f"{base}.0", params["adapt"][i]["conv1"])
        _rev_conv(sd, f"{base}.2", params["adapt"][i]["conv2"])
        sd[f"{base}.3.weight"] = torch.tensor(
            np.asarray(params["adapt"][i]["bn_scale"]))
        sd[f"{base}.3.bias"] = torch.tensor(
            np.asarray(params["adapt"][i]["bn_bias"]))
        sd[f"{base}.3.running_mean"] = torch.tensor(
            np.asarray(state["adapt"][i]["mean"]))
        sd[f"{base}.3.running_var"] = torch.tensor(
            np.asarray(state["adapt"][i]["var"]))
        sd[f"{base}.3.num_batches_tracked"] = torch.tensor(0)
    _rev_lin(sd, "fc_pose", params["fc_pose"])
    torch.save(sd, pt_path)


def main(argv=None):
    """CLI: python -m dfnet_tpu.convert <in.tar|in.pt> <out.npz>
    [--kind nerf|dfnet|vgg16]. An .npz source with a .tar/.pt
    destination exports OUR checkpoint back to the reference format."""
    import argparse

    from dfnet_tpu.training.checkpoints import load_pytree, save_pytree

    ap = argparse.ArgumentParser(description="Convert reference torch "
                                 "checkpoints to dfnet_tpu npz pytrees "
                                 "(or export npz back to torch formats)")
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--kind", choices=["nerf", "dfnet", "vgg16"], default=None)
    ap.add_argument("--netdepth", type=int, default=8)
    args = ap.parse_args(argv)

    if args.src.endswith(".npz"):  # export: ours → reference format
        tree, meta = load_pytree(args.src)
        params = tree.get("params", tree)
        if args.dst.endswith(".tar"):
            export_nerf_checkpoint(params, args.dst,
                                   global_step=int(meta.get("global_step", 0)))
        else:
            export_dfnet_checkpoint(params, tree["state"], args.dst)
        print(f"exported {args.src} -> {args.dst} (reference format)")
        return

    kind = args.kind
    if kind is None:
        kind = "nerf" if args.src.endswith(".tar") else "dfnet"
    if kind == "nerf":
        params, meta = convert_nerf_checkpoint(args.src, D=args.netdepth)
        save_pytree(args.dst, {"params": params}, **meta)
    elif kind == "dfnet":
        params, state = convert_dfnet_checkpoint(args.src)
        save_pytree(args.dst, {"params": params, "state": state})
    else:
        save_pytree(args.dst, {"encoder": convert_vgg16_imagenet(args.src)})
    print(f"converted {args.src} ({kind}) -> {args.dst}")


if __name__ == "__main__":
    main()
