"""humor_tpu — a TPU-native framework for 3D human motion modeling and
robust pose estimation (the capabilities of HuMoR, ICCV 2021), built on
jax / XLA / pallas / pjit.

Subpackages:
  ops        rotation transforms, MLP blocks, chamfer distance, robust stats
  body_model SMPL-family body model (native JAX LBS) + skeleton constants
  models     HuMoR CVAE, typed motion state, canonicalization, GMM, VPoser
  losses     training ELBO
  data       AMASS pipeline, fitting datasets, synthetic fixtures
  fitting    test-time optimization (L-BFGS stages, energies, camera)
  parallel   device-mesh sharding for training and batched TTO
  train      training / eval runtimes
  utils      config, checkpointing, logging, stats
  viz        host-side export / rendering helpers
"""

__version__ = "0.1.0"
