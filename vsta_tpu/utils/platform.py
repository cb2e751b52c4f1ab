"""Backend/platform selection honoring ``RUNTIME.DEVICE``.

The reference selects its device from the config with a CPU fallback
(reference: project/train.py:114-122, project/inference.py:24). The JAX
analog is platform selection, which on hosts whose ``sitecustomize``
imports jax at interpreter startup cannot be steered by ``JAX_PLATFORMS``
in the environment (the value is latched before user code runs) - only a
``jax.config.update`` before first backend use works.
"""

from __future__ import annotations

import os


def enable_compile_cache(repo_root: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``<repo>/.jax_cache``.

    One shared location for every entry point (bench.py, tests/conftest,
    __graft_entry__) so compiled programs are reused across processes on
    this slow-compile host. Thresholds are zeroed so even tiny programs
    are cached. Safe to call multiple times; a no-op once a backend has
    latched the settings.
    """
    if repo_root is None:
        # vsta_tpu/utils/platform.py -> repo root is two levels up
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(repo_root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def select_platform(device: str) -> None:
    """Force the CPU backend when ``RUNTIME.DEVICE`` is ``cpu``.

    Must be called before JAX initializes its backends (i.e. before any
    array op / ``jax.devices()``); a no-op for every other device string
    (the ambient platform - TPU here - is the default).
    """
    if str(device).lower() != "cpu":
        return
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception as e:
        # backend already initialized; the run continues on the ambient
        # platform - if that is not cpu, the user asked for something
        # they are not getting: say so out loud (ADVICE round 2)
        if jax.default_backend() != "cpu":
            import warnings

            warnings.warn(
                f"RUNTIME.DEVICE=cpu could not be applied ({e}); "
                f"continuing on the ambient '{jax.default_backend()}' "
                "platform",
                stacklevel=2,
            )
