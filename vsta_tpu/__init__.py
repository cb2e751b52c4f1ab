"""vsta_tpu — TPU-native multi-view BEV pedestrian perception framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
sea-sky-web/Vision-based-Spatio-Temporal-Analysis ("BEV-PedTrack"):
multi-camera images -> shared CNN encoder -> homography warp onto the
ground plane (BEV) -> cross-view fusion -> CenterNet-style detection
head -> world-coordinate pedestrian detections (+ SORT tracking).

Design stance (TPU-first, not a port):
  * functional core: pure ``init``/``apply``/``loss``/``decode`` over pytrees,
    one jit-compiled train step;
  * static shapes everywhere (objects and detections padded to config caps);
  * the per-(batch, view) Python warp loop of the reference
    (reference: project/models/fusion/geometry.py:120-121) is replaced by a
    fused linear-warp formulation: project per-view features with the fusion
    1x1 conv FIRST, then warp the (much smaller) projected maps and sum over
    views - mathematically identical because bilinear warping is linear and
    the reference fuses by concat + 1x1 conv;
  * the warp itself runs either as a vectorized XLA gather or as an
    on-the-fly one-hot matmul Pallas kernel that rides the MXU;
  * scaling via ``jax.sharding.Mesh`` (data x view axes) with XLA collectives.
"""

__version__ = "0.3.0"
