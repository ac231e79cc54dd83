"""dfnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) camera-relocalization framework.

Re-designed from scratch with the capabilities of ActiveVisionLab/DFNet
(ECCV 2022): a three-stage pipeline

  1. Histogram-assisted NeRF ("NeRF-H", a NeRF-W variant) per scene
     (reference: /root/reference/script/run_nerf.py, script/models/).
  2. DFNet — a VGG16-based siamese pose regressor + domain-invariant
     feature extractor trained with triplet loss and NeRF-rendered
     Random View Synthesis (reference: script/run_feature.py, script/feature/).
  3. DFNet_dm — self-supervised direct feature matching that renders the
     frozen NeRF at the predicted pose and backpropagates a cosine
     feature loss through the differentiable volume renderer into the
     pose (reference: script/train.py, script/feature/direct_feature_matching.py).

The compute path is pure JAX: fixed-shape jitted train/render steps,
ray batches sharded over a `jax.sharding.Mesh`, optional fused Pallas
kernels for the ray→sample→MLP→composite hot loop.
"""

__version__ = "0.1.0"
