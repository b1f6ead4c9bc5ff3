"""Device kernels (JAX/XLA/Pallas).

Importing this package enables JAX's persistent compilation cache: the axon
TPU backend's first compile of integer-heavy graphs is extremely slow
(~2 minutes for a single Montgomery multiply), and the cache cuts warm
starts to seconds.  Override the location with ZIGZ_TPU_COMPILE_CACHE, or
set it to "off" to disable.
"""

import os as _os

import jax as _jax

_cache_dir = _os.environ.get("ZIGZ_TPU_COMPILE_CACHE", "/root/.cache/jax_comp_cache")
if _cache_dir != "off":
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
