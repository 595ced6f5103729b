"""damc_tpu — TPU-native Diffusion-Amortized MCMC framework.

A from-scratch JAX/XLA/Pallas/pjit implementation of latent-space energy-based
generative modeling trained with Diffusion-Amortized MCMC (DAMC), covering the
full capability surface of the NeurIPS 2023 reference implementation
(yuPeiyu98/Diffusion-Amortized-MCMC): image generation + reconstruction
(SVHN / CIFAR-10 / CelebA-64 / CelebA-HQ-256), MNIST anomaly detection,
StyleGAN inversion, and the 2-D toy posterior parity experiment.

Layering (see SURVEY.md §7):
  ops/       pure-function diffusion math + scan Langevin kernels + Pallas kernels
  models/    Flax model zoo: generators, latent EBM, encoders, denoiser, amortizer
  parallel/  mesh / sharding helpers (data-parallel chains over ICI)
  train/     fused jitted train steps + host driver loops
  data/      dataset pipelines (pinwheel toy, MNIST anomaly, CIFAR/SVHN/CelebA)
  metrics/   FID (InceptionV3), PR-AUC, recon MSE, MMD
  utils/     config tree, logging, checkpointing (Orbax)
  cli/       entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
