"""efficientsam3-tpu: TPU-native promptable concept segmentation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
SimonZeng7108/efficientsam3: SAM3 promptable concept segmentation (text +
box + point prompts -> all matching instance masks, images and videos) with
distilled student encoders (RepViT / TinyViT / EfficientViT vision trunks,
MobileCLIP text towers).

Layout:
  models/    flax.linen model definitions (backbones, fusion, decoder, heads)
  ops/       TPU-first numerical ops (torch-parity resize / roi_align /
             grid_sample, masks, NMS, CCL, EDT) + Pallas kernels
  parallel/  mesh construction and sharding strategies (frame/object/data axes)
  train/     losses, matchers, optimizers, trainers, distillation stages
  utils/     checkpoint conversion, tokenizer, misc
  video/     streaming-memory tracker + per-frame det+track SPMD step
"""

__version__ = "0.1.0"
