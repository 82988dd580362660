"""Persistent XLA compilation cache setup.

The fused frame step is a large program (~1-3 min to compile per
geometry/tier on a remote-compile backend); caching compiled executables
on disk makes every process after the first start instantly.  Called by
the device recon backends before their first jit compilation.
"""

import hashlib
import os

_done = False


def _host_key() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU AOT executables embed the compile machine's features; a
    cache entry written on one host can SIGILL/SIGSEGV when
    deserialized on a host with a different feature set (observed:
    cpu_aot_loader.cc 'machine type ... doesn't match' followed by a
    segfault inside deserialize_executable).  Scoping the cache dir by
    host flags makes a host change a cache miss instead of a crash.
    TPU executables are host-independent but cheap to recompile."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_persistent_cache():
    global _done
    if _done or os.environ.get("CUDA_VP9_TPU_NO_JAX_CACHE"):
        return
    _done = True
    try:
        import jax
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        d = os.environ.get("CUDA_VP9_TPU_JAX_CACHE",
                           os.path.join(repo, ".jax_cache"))
        d = os.path.join(d, _host_key())
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail decode for it
