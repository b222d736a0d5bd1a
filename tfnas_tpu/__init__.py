"""TF-NAS-TPU: a TPU-native reimplementation of latency-constrained
differentiable NAS (TF-NAS, ECCV 2020) built on JAX/XLA/Pallas.

This is NOT a port of the PyTorch reference (AberHu/TF-NAS). The search
space, cost model, file formats and CLI contracts match the reference
(`/root/reference`, cited per-module as file:line), but the architecture is
designed for TPU from the ground up:

- NHWC activations / HWIO kernels, bf16 compute with fp32 master params,
  everything under `jax.jit` with static shapes.
- Width elasticity ("elasticity-scaling") is expressed as channel masks over
  fixed max-width parameters instead of per-epoch tensor reshapes, so the
  entire 90-epoch search runs one compiled step function with zero recompiles
  (the reference rebuilds the network and `index_select`s checkpoints every
  epoch, train_search.py:156-194).
- The bi-level search step (bi-sampling weight step + soft Gumbel arch step)
  is a single jitted function; op sampling is functional `jax.random`.
- Data parallelism is `jax.sharding.Mesh` + sharding annotations with XLA
  collectives (psum cross-replica BN), not NCCL/DataParallel.
- The hot MixedOp path has a fused Pallas TPU kernel.
"""

__version__ = "0.1.0"
