"""Process-level JAX setup shared by all CLIs: persistent compilation cache
(the unrolled GShiftNet graphs take minutes to compile — cache makes every
subsequent launch instant) and fp32 precision pinning for parity runs."""
import os


def setup_jax(cache_dir: str | None = None, highest_precision: bool = False):
    import jax
    cache_dir = cache_dir or os.environ.get(
        'SHIFTNET_XLA_CACHE', os.path.expanduser('~/.cache/shiftnet_xla'))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    if highest_precision:
        jax.config.update('jax_default_matmul_precision', 'highest')
