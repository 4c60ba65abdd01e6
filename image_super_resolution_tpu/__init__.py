"""image_super_resolution_tpu — a TPU-native super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
thnak/image_super_resolution (single-GPU PyTorch), redesigned TPU-first:

- NHWC layouts, bf16 compute / fp32 params, XLA-fused convolutions.
- Data-parallel training over a ``jax.sharding.Mesh`` with ``psum`` gradient
  reduction; spatially-sharded tiled inference with halo exchange over ICI.
- On-device data degradation (resize / noise / JPEG-proxy) instead of host
  albumentations.
- Orbax/msgpack checkpoints; a frozen uint8->uint8 deployment artifact
  (the TorchScript ``model.pt`` equivalent) exported via ``jax.export``.

Layer map mirrors the reference (see SURVEY.md §1): data -> ops -> models ->
losses -> train -> export -> infer -> video.
"""

__version__ = "0.1.0"
