"""depthg_tpu — a TPU-native (JAX/XLA/Pallas) framework for unsupervised semantic
segmentation via depth-guided feature correlation (DepthG, CVPR 2024).

This is a from-scratch re-design of the capabilities of leonsick/depthg
(pure PyTorch, single GPU) for TPU hardware:

* the compute path is pure-functional JAX compiled by XLA (MXU matmuls, bf16),
* hot sampling/correlation/CRF loops are device-resident (Pallas / fused XLA)
  instead of the reference's host numpy / C++ round-trips,
* scaling is expressed with ``jax.sharding.Mesh`` + NamedSharding collectives
  over ICI rather than DataParallel/NCCL.

Layout:
    depthg_tpu.config     — YAML config system with dotted CLI overrides
    depthg_tpu.ops        — torch-semantics tensor ops (resize, grid_sample,
                            correlation, FPS, CRF) built TPU-first
    depthg_tpu.models     — DINO ViT backbone, featurizers, probes (param pytrees)
    depthg_tpu.data       — datasets, transforms, contrastive pairing, host loader
    depthg_tpu.train      — train state (3 optimizers), losses, decay schedules
    depthg_tpu.parallel   — device mesh, sharded eval/train steps, sharded KNN
    depthg_tpu.utils      — metrics (Hungarian mIoU), checkpoint conversion
"""

__version__ = "0.1.0"
