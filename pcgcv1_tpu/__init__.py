"""pcgcv1_tpu — TPU-native learned point-cloud geometry compression.

A from-scratch JAX/XLA/Pallas framework with the capabilities of PCGCv1
(NJUVISION, "Lossy Point Cloud Geometry Compression via End-to-End Learning",
TCSVT 2021): a learned lossy codec for voxelized point-cloud geometry.

Layer map (mirrors the reference capability surface, reference file cited per
module; see SURVEY.md):

- ``ops``       — geometry core: PLY io, cube partition, voxelization,
                  rho-weighted adaptive top-k classification.
- ``models``    — VoxceptionResNet and simple analysis/synthesis transforms,
                  hyper encoder/decoder (flax).
- ``entropy``   — factorized entropy bottleneck and Laplace conditional
                  entropy model (training-side likelihoods on device).
- ``native``    — C++ runtime: deterministic range coder, Laplace/factorized
                  symbol coders, lossless octree coder for cube positions.
- ``codec``     — batched compress/decompress drivers and the bitstream
                  container.
- ``metrics``   — D1/D2 PSNR (pc_error equivalent) and BD-rate.
- ``training``  — losses, data pipeline, pjit train loop, checkpoints.
- ``parallel``  — device mesh / sharding helpers.
"""

__version__ = "0.1.0"
