"""DiffusionDepth-TPU: a TPU-native (JAX / Flax / Pallas) re-implementation of the
capabilities of duanyiqun/DiffusionDepth (ECCV 2024).

Monocular depth estimation as conditional denoising diffusion:
a CNN/ViT backbone extracts multi-scale visual-condition features, an FPN head
collapses them into a single condition map, and a small conv denoiser iteratively
denoises a random latent under DDIM scheduling; a learned depth transform maps
between metric depth and latent space.

Design stance (TPU-first, not a port):
  * NHWC layouts everywhere; Flax Linen modules; static shapes.
  * The whole DDIM sampling loop is a single ``lax.scan`` over precomputed
    per-step alpha tables - zero host<->device sync (the reference does Python
    float math per step, src/main.py + scheduling_ddim.py).
  * Data parallelism via ``jax.sharding.Mesh`` + GSPMD (the reference uses
    mp.spawn + NCCL DDP, src/main.py:72-148); cross-replica BatchNorm statistics
    fall out of sharded ``jnp.mean`` automatically under jit.
  * Hot kernels (Swin window attention, multi-scale deformable attention,
    modulated deformable conv) get Pallas TPU kernels with XLA-composition
    fallbacks.
"""

__version__ = "0.1.0"
