"""GuassianHand-TPU: a TPU-native (JAX/XLA/Pallas) framework for interaction-aware
3D Gaussian splatting one-shot hand avatars.

Re-designed from scratch for TPU hardware with the capabilities of the reference
CUDA/PyTorch codebase (XuanHuang0/GuassianHand):

- ``core``      camera/projection math, Gaussian pytrees, spherical harmonics
- ``ops``       the differentiable tile rasterizer (Pallas fwd/bwd kernels + a pure-XLA
                oracle), kNN, scatter pooling, bilinear sampling, mesh subdivision
- ``mano``      JAX MANO linear-blend-skinning + UV atlas
- ``nn``        transformer backbone, point encoders, tokenizers, Gaussian decode heads
- ``models``    the one-shot avatar model composition (+ texture-edit variants)
- ``render``    GS3DRenderer equivalent: validity/densify, UV residual maps, vmapped views
- ``train``     fitting loop, losses (L1/VGG/mask), metrics (PSNR/SSIM/LPIPS)
- ``parallel``  device mesh, shardings, Gaussian<->tile exchange
- ``data``      InterHand2.6M pipeline + synthetic data for tests/benches
"""

__version__ = "0.1.0"

# NOTE: importing this package has no side effects. Entry points (CLIs,
# bench.py, scripts) opt into the persistent XLA compilation cache by calling
# guassianhand_tpu.utils.jaxcache.enable_persistent_cache() themselves.

