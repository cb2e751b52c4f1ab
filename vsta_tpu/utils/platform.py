"""Backend/platform selection honoring ``RUNTIME.DEVICE``.

The reference selects its device from the config with a CPU fallback
(reference: project/train.py:114-122, project/inference.py:24). The JAX
analog is platform selection, which on hosts whose ``sitecustomize``
imports jax at interpreter startup cannot be steered by ``JAX_PLATFORMS``
in the environment (the value is latched before user code runs) - only a
``jax.config.update`` before first backend use works.
"""

from __future__ import annotations


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
