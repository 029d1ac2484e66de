"""Persistent-compile-cache setup that actually survives source edits.

One call configures JAX's persistent compilation cache the way every
entry point in this repo needs it:

    from motionclone_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()          # before building any jitted function

Besides pointing the cache at a shared directory, this disables
``jax_include_full_tracebacks_in_locations`` — and that flag is the
load-bearing part.  Measured failure mode on the v5e (round 4): the
cache key canonicalizes the OUTER module with ``strip-debuginfo``, but
Pallas/Mosaic kernels ride inside ``stablehlo.custom_call`` payloads
whose own MLIR carries full traceback locations — including the frames
of the CALLING script.  Any edit to a caller (bench.py, a sweep script)
therefore re-keyed every kernel-bearing executable: the production
guided-chunk key changed from ``d2f126…`` to ``d7cb25…`` merely by
shifting the caller's line numbers by three, forcing a fresh ~600 s
compile per entry point per edit.  With full tracebacks off, locations
collapse to the op's own frame (this package's source, stable), and the
same shifted caller HITS the cache (key ``138475…`` both ways).

The cost is shorter location chains in XLA error messages; compile
determinism across entry points is worth far more here.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def setup_compile_cache(
    cache_dir: str = DEFAULT_CACHE_DIR,
    *,
    min_compile_seconds: float = 5.0,
) -> str:
    """Enable the persistent compile cache with edit-stable keys.

    Must run before the first jitted computation is built (flags are read
    at trace/lowering time).  Returns the cache directory.
    """
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_seconds
    )
    # THE key stabilizer — see module docstring
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    return cache_dir
