"""DirectVoxGO-TPU: a TPU-native (JAX/XLA/Pallas) re-implementation of the
DirectVoxGO framework (reference: hbell99/DirectVoxGO).

Design stance (see SURVEY.md §7): idiomatic JAX rather than a line port.
The reference's ragged CUDA hot path (lib/cuda/render_utils_kernel.cu) becomes
static-shape `[n_rays, n_samples]` tensors with validity masks plus two
fixed-capacity compaction stages; its CUDA optimizer / TV kernels become
functional JAX transforms; parallelism (new capability, the reference is
single-GPU) is data-parallel-over-rays via jax.sharding.
"""

__version__ = "0.1.0"
