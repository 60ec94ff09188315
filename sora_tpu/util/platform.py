"""JAX platform/bootstrap helpers shared by the CLI apps.

Two container quirks every entry point must handle (the library itself
stays import-side-effect free; only ``main()``s call this):

* The image's sitecustomize registers the axon TPU plugin and pins
  ``jax_platforms=axon`` at import time, so the standard
  ``JAX_PLATFORMS=cpu`` env contract silently loses and a "CPU" run
  grabs the (single, shared) TPU tunnel instead.  Re-assert the env var
  through ``jax.config`` before any backend initializes — the same
  override tests/conftest.py applies.
* First-compile of the full RX pipeline happens on the remote axon
  compile service and can take minutes; the persistent compilation
  cache turns every later process start into a disk hit.  The reference
  has the same boot-cost asymmetry (graph build + LUT init vs. steady
  state, dot11main.cpp:207-257) but pays it every run — we don't have to.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None):
    """Call at the top of every app ``main()`` before using JAX.

    Returns the imported ``jax`` module.
    """
    import jax

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        jax.config.update("jax_platforms", env)
    if cache_dir is None:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return jax
