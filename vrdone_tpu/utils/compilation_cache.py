"""Persistent XLA compilation cache.

TPU compiles of the full model take minutes on a cold process (the axon
remote-compile path); the persistent cache makes every subsequent process
start near-instant. Imported for side effects by entry points and bench.
"""

import os

import jax

_CACHE_DIR = os.environ.get("VRDONE_TPU_COMPCACHE",
                            os.path.expanduser("~/.cache/vrdone_tpu_xla"))


def enable():
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


enable()
