"""waldo_tpu — TPU-native layered video decomposition & future-frame prediction.

A from-scratch JAX/XLA/Pallas re-design of the WALDO pipeline
(reference: 16lemoing/waldo): three separately trained modules

  * LVD — layered video decomposition (object layers, soft masks, TPS poses)
  * FLP — future layer prediction (transformer rollout of per-layer poses)
  * WIF — warping / inpainting / fusion of warped context frames

re-architected for TPU: pure-functional flax models, static shapes, pjit/mesh
data parallelism over ICI, and Pallas kernels for the warping hot path.
"""

__version__ = "0.1.0"
