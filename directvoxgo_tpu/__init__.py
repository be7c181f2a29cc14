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

# Persistent XLA compilation cache, on by default. The reference framework
# ships precompiled CUDA kernels, so its first step costs nothing extra; a
# JAX framework pays per-shape jit compiles instead (~2-100 s each on TPU) —
# across a full run.py schedule (3 sweep axes x pg_scale stages x dispatch
# widths) that is minutes of wall clock. Caching them on disk makes every
# run after the first start hot, which is the deployment-relevant behavior.
# Opt out / relocate with JAX_COMPILATION_CACHE_DIR.
import os as _os

if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    import jax as _jax

    _cache_dir = _os.path.expanduser("~/.cache/directvoxgo_tpu/jax_cache")
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # read-only fs etc. — cache is an optimization only
        pass
