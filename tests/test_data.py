import json
import os
import os.path as osp

import numpy as np
import pytest

from dfnet_tpu.config import parse_args
from dfnet_tpu.data.color import rgb_to_yuv, luminance_histogram, downscale_area
from dfnet_tpu.data.loader import load_scene
from dfnet_tpu.data.seven_scenes import load_seven_scenes_split
from dfnet_tpu.data.synthetic import make_synthetic_scene, make_blob_field, render_gt_image


def test_rgb_to_yuv_matches_reference_matrix():
    img = np.array([[[1.0, 0.0, 0.0]]], dtype=np.float32)
    yuv = rgb_to_yuv(img)
    np.testing.assert_allclose(yuv[0, 0], [0.299, -0.147, 0.615], atol=1e-6)


def test_luminance_histogram_sums_to_100ish():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    h = luminance_histogram(img, 10)
    assert h.shape == (10,)
    assert h.dtype == np.int32
    assert 95 <= h.sum() <= 105  # rounding can drift a few %
    # constant mid-gray puts everything in one bin
    h2 = luminance_histogram(np.full((8, 8, 3), 0.55, np.float32), 10)
    assert h2.max() == 100 and (h2 > 0).sum() == 1


def test_downscale_area_is_box_average_for_integer_factor():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    out = downscale_area(img, 2.0)
    expect = img.reshape(4, 2, 4, 2, 3).mean((1, 3))
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_synthetic_scene_shapes_and_determinism():
    s1 = make_synthetic_scene(n_train=4, n_val=2, H=12, W=16, seed=3)
    s2 = make_synthetic_scene(n_train=4, n_val=2, H=12, W=16, seed=3)
    assert s1.train.images.shape == (4, 12, 16, 3)
    assert s1.val.poses.shape == (2, 3, 4)
    np.testing.assert_array_equal(s1.train.images, s2.train.images)
    assert s1.train.images.max() > 0.05  # scene is not empty
    # rotations are orthonormal
    for p in s1.train.poses:
        np.testing.assert_allclose(p[:3, :3] @ p[:3, :3].T, np.eye(3), atol=1e-5)


def test_synthetic_render_view_consistency():
    field = make_blob_field(0)
    s = make_synthetic_scene(n_train=2, n_val=1, H=10, W=10, seed=0)
    img = render_gt_image(field, s.train.poses[0], 10, 10, s.focal, s.near, s.far)
    np.testing.assert_allclose(img, s.train.images[0], atol=1e-6)


def _write_fake_7scenes(root, scene="heads", n_frames=6, H=16, W=16):
    """Create a miniature MSR-layout 7-Scenes dataset on disk."""
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
            Image.fromarray(arr).save(osp.join(seq_dir, f"frame-{f:06d}.color.png"))
            pose = np.eye(4)
            pose[:3, 3] = rng.normal(size=3)
            np.savetxt(osp.join(seq_dir, f"frame-{f:06d}.pose.txt"), pose)
    with open(osp.join(img_dir, "TrainSplit.txt"), "w") as fh:
        fh.write("sequence1\n")
    with open(osp.join(img_dir, "TestSplit.txt"), "w") as fh:
        fh.write("sequence2\n")
    with open(osp.join(meta_dir, "world_setup.json"), "w") as fh:
        json.dump({"near": 0, "far": 2.5, "pose_scale": 1, "pose_scale2": 1,
                   "move_all_cam_vec": [0.0, 0.0, 1.0]}, fh)
    return osp.join(root, "7Scenes", scene)


def test_seven_scenes_reader_and_loader(tmp_path):
    datadir = _write_fake_7scenes(str(tmp_path))
    img_root = osp.join(str(tmp_path), "deepslam_data", "7Scenes")

    split = load_seven_scenes_split(img_root, "heads", train=True, skip=2, df=2.0)
    assert split.images.shape == (3, 8, 8, 3)   # 6 frames, skip 2, df 2
    assert split.poses.shape == (3, 3, 4)
    assert split.hists.shape == (3, 10)
    np.testing.assert_array_equal(split.gt_idx, [0, 2, 4])

    cfg = parse_args([
        "--datadir", datadir, "--dataset_type", "7Scenes",
        "--df", "2", "--trainskip", "2", "--encode_hist",
    ], stage="nerf")
    scene = load_scene(cfg, stage="nerf")
    assert scene.train.images.shape[0] == 3
    assert scene.val.images.shape[0] == 6
    assert scene.near == 0 and scene.far == 2.5
    # NeRF stage rescales: move_all_cam_vec z+=1 applied
    cfg_apr = cfg.replace(pose_only=1)
    scene_apr = load_scene(cfg_apr, stage="apr")
    np.testing.assert_allclose(
        scene.train.poses[:, :3, 3],
        scene_apr.train.poses[:, :3, 3] + [0, 0, 1.0], atol=1e-5)
    # rotations identical between stages
    np.testing.assert_allclose(
        scene.train.poses[:, :3, :3], scene_apr.train.poses[:, :3, :3], atol=1e-6)


def test_loader_synthetic():
    cfg = parse_args(["--dataset_type", "synthetic"], stage="nerf")
    scene = load_scene(cfg)
    assert scene.train.images.shape[1:] == (48, 64, 3)


def test_loader_unknown_dataset_type_errors_early():
    # a typo'd type must raise the clear ValueError, not a confusing
    # FileNotFoundError for a world_setup.json of the wrong layout
    import pytest

    cfg = parse_args(["--dataset_type", "bogus"], stage="nerf")
    with pytest.raises(ValueError, match="unknown dataset_type"):
        load_scene(cfg)


def _write_fake_cambridge(root, scene="KingsCollege", n=5, H=32, W=32):
    from PIL import Image

    for split in ("train", "test"):
        rgb = osp.join(root, "deepslam_data", "Cambridge", scene, split, "rgb")
        poses = osp.join(root, "deepslam_data", "Cambridge", scene, split, "poses")
        os.makedirs(rgb, exist_ok=True)
        os.makedirs(poses, exist_ok=True)
        rng = np.random.default_rng(0 if split == "train" else 1)
        for i in range(n):
            arr = (rng.uniform(0, 1, (H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(osp.join(rgb, f"frame{i:05d}.png"))
            pose = np.eye(4)
            pose[:3, 3] = rng.normal(size=3)
            np.savetxt(osp.join(poses, f"frame{i:05d}.txt"), pose)
    meta = osp.join(root, "Cambridge", scene)
    os.makedirs(meta, exist_ok=True)
    with open(osp.join(meta, "world_setup.json"), "w") as fh:
        json.dump({"near": 0.2, "far": 10, "pose_scale": 0.5, "pose_scale2": 1,
                   "move_all_cam_vec": [0.0, 0.0, 0.0]}, fh)
    return osp.join(root, "Cambridge", scene)


def test_cambridge_reader_and_loader(tmp_path):
    from dfnet_tpu.data.cambridge import load_cambridge_split

    datadir = _write_fake_cambridge(str(tmp_path))
    img_root = osp.join(str(tmp_path), "deepslam_data", "Cambridge")
    split = load_cambridge_split(img_root, "KingsCollege", train=True, skip=2, df=2.0)
    assert split.images.shape == (3, 16, 16, 3)
    assert split.poses.shape == (3, 3, 4)

    cfg = parse_args([
        "--datadir", datadir, "--dataset_type", "Cambridge",
        "--df", "2", "--encode_hist",
    ], stage="nerf")
    scene = load_scene(cfg, stage="nerf")
    assert scene.train.images.shape[0] == 5 and scene.val.images.shape[0] == 5
    # Cambridge fix: rotations remain orthonormal, pose_scale applied
    for p in scene.train.poses:
        R = np.asarray(p[:3, :3], dtype=np.float64)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_save_pose_avg_stats(tmp_path):
    datadir = _write_fake_7scenes(str(tmp_path))
    cfg = parse_args([
        "--datadir", datadir, "--dataset_type", "7Scenes",
        "--save_pose_avg_stats", "--encode_hist",
    ], stage="nerf")
    load_scene(cfg, stage="nerf")
    stats = np.loadtxt(osp.join(datadir, "pose_avg_stats.txt"))
    assert stats.shape == (3, 4)
    # and loading them back works
    cfg2 = cfg.replace(save_pose_avg_stats=False, load_pose_avg_stats=True)
    scene = load_scene(cfg2, stage="nerf")
    assert scene.train.poses.shape[-2:] == (3, 4)


def test_prefetch_iterator_order_and_device():
    import jax

    from dfnet_tpu.data.prefetch import PrefetchIterator, epoch_prefetch
    from dfnet_tpu.data.synthetic import make_synthetic_scene

    # deterministic order, all items delivered once, on device
    seen = []
    it = PrefetchIterator(lambda i: {"x": np.full((2, 2), i)}, range(5), depth=2)
    for b in it:
        assert isinstance(b["x"], jax.Array)
        seen.append(int(np.asarray(b["x"])[0, 0]))
    assert seen == [0, 1, 2, 3, 4]
    assert len(it) == 5

    # epoch iterator over a Split
    scene = make_synthetic_scene(n_train=7, n_val=1, H=8, W=8, seed=0)
    rng = np.random.default_rng(0)
    batches = list(epoch_prefetch(scene.train, batch_size=2, rng=rng))
    assert len(batches) == 3  # drop_last
    imgs, poses, hists = batches[0]
    assert imgs.shape == (2, 8, 8, 3) and poses.shape == (2, 3, 4)


def test_prefetch_propagates_errors():
    from dfnet_tpu.data.prefetch import PrefetchIterator

    def bad(i):
        if i == 2:
            raise ValueError("boom")
        return {"x": np.zeros(1)}

    it = PrefetchIterator(bad, range(4), depth=1)
    with pytest.raises(ValueError, match="boom"):
        for _ in it:
            pass
