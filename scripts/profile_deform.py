#!/usr/bin/env python
"""Stage breakdown of the deformable-attention training step.

VERDICT round 4, task 3: deform trains at ~62 f/s vs concat's ~132 —
give it the same decomposition the concat path got. Stages (batch 8,
`configs/wildtrack_deform.yaml` shapes: 7 views 270x480, B0 encoder,
BEV 120x360, stride-4 query grid 30x90, heads=4 points=4):

  full step / fwd+loss / fwd+bwd       - the aggregate splits
  encoder fwd+bwd                       - shared with the concat family
  head fwd+bwd                          - shared with the concat family
  deform module fwd / fwd+bwd           - DeformableFusion in isolation
  sampler fwd / fwd+bwd                 - sample_bilinear_many at the
                                          module's G=B*V*M, S=Hq*Wq*P
  attention glue (module minus sampler) - denses + softmax + einsum

Optionally sweeps the grouped-kernel span width for the backward
(--grwin-sweep re-execs the module stage in subprocesses with
VSTA_GRWIN set; the forward sweep chose 512, the backward had never
been swept).

Usage: python scripts/profile_deform.py [--batch 8] [--grwin-sweep]
"""

import argparse
import functools as ft
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_LO, N_HI, N_REPEAT = 2, 6, 3


def slope_time(run_n, *args):
    def timed(n):
        best = float("inf")
        for _ in range(N_REPEAT):
            t0 = time.perf_counter()
            float(run_n(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    float(run_n(N_LO, *args))  # compile
    float(run_n(N_HI, *args))
    return (timed(N_HI) - timed(N_LO)) / (N_HI - N_LO)


def module_stage(cfg, batch_size, what):
    """Time DeformableFusion (or its sampler) fwd / fwd+bwd in isolation
    at the shapes the deform model uses. Returns ms."""
    import jax
    import jax.numpy as jnp

    from vsta_tpu.models.fusion import DeformableFusion

    m = cfg.model
    B, V = batch_size, cfg.data.views
    Hb, Wb = m.bev_size
    s = max(1, m.attn_stride)
    Hq, Wq = Hb // s, Wb // s
    # encoder output at OUT_INDEX=2: stride 8 over 270x480 -> 34x60
    Hf, Wf = (cfg.data.img_size[0] + 7) // 8, (cfg.data.img_size[1] + 7) // 8
    C = m.feat_dim
    M, P = m.attn_heads, m.attn_points
    dt = jnp.bfloat16 if cfg.runtime.use_amp else jnp.float32

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, V, Hf, Wf, C)), dt)
    # REALISTIC sampling geometry: the model's refpoints are projected
    # BEV ground points, which cluster within each view - uniform-random
    # coords would measure the documented worst case (~2x wider spans,
    # docs/PERFORMANCE.md) instead of the deployed regime
    from vsta_tpu.data.synthetic import make_ring_camera
    from vsta_tpu.geometry import ground_grid
    from vsta_tpu.geometry.bev import bev_sample_coords_with_depth

    Ks, Rts = zip(*(make_ring_camera(v, V, img_hw=tuple(cfg.data.img_size))
                    for v in range(V)))
    grid = ground_grid(Hb, Wb, m.bev_bounds)
    coords_full, depth_full = bev_sample_coords_with_depth(
        jnp.asarray(np.stack(Ks), jnp.float32),
        jnp.asarray(np.stack(Rts), jnp.float32),
        tuple(cfg.data.img_size), (Hf, Wf), grid)
    coords = jnp.broadcast_to(
        coords_full[None, :, ::s, ::s], (B, V, Hq, Wq, 2))
    depth_w = jnp.broadcast_to(
        depth_full[None, :, ::s, ::s], (B, V, Hq, Wq))
    query = jnp.asarray(
        rng.standard_normal((B, Hq, Wq, m.bev_proj_ch + 2)), dt)

    if what in ("sampler_fwd", "sampler_bwd"):
        from vsta_tpu.ops.warp import sample_bilinear_many

        hc = m.bev_proj_ch // M
        G = B * V * M
        S = Hq * Wq * P
        vals = jnp.asarray(rng.standard_normal((G, Hf, Wf, hc)), dt)
        # locs = realistic refpoints + the ring init offsets (radius <= P
        # feature px), replicated across B*M groups - the deployed
        # clustering, not uniform-random
        from vsta_tpu.models.fusion import _ring_offset_init

        ring = np.asarray(_ring_offset_init(M, P))  # [M,P,2]
        base = np.asarray(coords_full[:, ::s, ::s]).reshape(V, Hq * Wq, 2)
        loc_v = (base[:, None, :, None, :]
                 + ring.transpose(0, 1, 2)[None, :, None, :, :])
        # [V, M, Hq*Wq, P, 2] -> tile over B -> [B,V,M,S,2] -> [G,S,2]
        loc_bv = np.broadcast_to(
            loc_v[None], (B,) + loc_v.shape).reshape(G, S, 2)
        locs = jnp.asarray(np.nan_to_num(loc_bv, nan=-10.0), jnp.float32)

        if what == "sampler_fwd":
            def fn(v, l, eps):
                return jnp.sum(
                    sample_bilinear_many(v + eps, l).astype(jnp.float32))
        else:
            def fn(v, l, eps):
                def loss(vv, ll):
                    return jnp.sum(
                        sample_bilinear_many(vv, ll).astype(jnp.float32))
                gv, gl = jax.grad(loss, argnums=(0, 1))(v + eps, l)
                return (jnp.sum(gv.astype(jnp.float32))
                        + jnp.sum(gl.astype(jnp.float32)))

        @ft.partial(jax.jit, static_argnums=(0,))
        def run_n(n, v, l):
            def body(i, acc):
                return fn(v, l, (acc * 1e-30).astype(v.dtype))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return slope_time(run_n, vals, locs) * 1e3

    mod = DeformableFusion(heads=M, points=P, out_ch=m.bev_proj_ch, dtype=dt)
    variables = mod.init(
        jax.random.PRNGKey(0), feats, coords, query, depth_w)

    if what == "module_fwd":
        def fn(f, eps):
            out = mod.apply(variables, f + eps, coords, query, depth_w)
            return jnp.sum(out.astype(jnp.float32))
    else:  # module_bwd: grad wrt params + feats + query (the train flow)
        def fn(f, eps):
            def loss(vv, ff, qq):
                out = mod.apply(vv, ff, coords, qq, depth_w)
                return jnp.sum(out.astype(jnp.float32))
            gv, gf, gq = jax.grad(loss, argnums=(0, 1, 2))(
                variables, f + eps, query)
            return (jax.tree_util.tree_reduce(
                        lambda a, x: a + x.sum().astype(jnp.float32), gv,
                        jnp.float32(0.0))
                    + jnp.sum(gf.astype(jnp.float32))
                    + jnp.sum(gq.astype(jnp.float32)))

    @ft.partial(jax.jit, static_argnums=(0,))
    def run_n(n, f):
        def body(i, acc):
            return fn(f, (acc * 1e-30).astype(f.dtype))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return slope_time(run_n, feats) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--config", default="configs/wildtrack_deform.yaml")
    ap.add_argument("--grwin-sweep", action="store_true")
    ap.add_argument("--stage", default=None,
                    help="internal: run ONE module stage and print ms "
                         "(used by --grwin-sweep subprocesses)")
    args = ap.parse_args()

    from vsta_tpu.config import load_config
    from vsta_tpu.utils.platform import enable_compile_cache

    enable_compile_cache(str(Path(__file__).resolve().parent.parent))
    cfg = load_config(args.config)

    if args.stage:
        ms = module_stage(cfg, args.batch, args.stage)
        print(json.dumps({"stage": args.stage, "ms": round(ms, 2),
                          "grwin": os.environ.get("VSTA_GRWIN", "512")}),
              flush=True)
        return

    if args.grwin_sweep:
        # fresh subprocess per width: GRWIN is latched at import
        for stage in ("module_fwd", "module_bwd"):
            for w in (256, 384, 512, 768, 1024):
                env = dict(os.environ, VSTA_GRWIN=str(w))
                out = subprocess.run(
                    [sys.executable, __file__, "--batch", str(args.batch),
                     "--config", args.config, "--stage", stage],
                    env=env, capture_output=True, text=True)
                line = [l for l in out.stdout.splitlines()
                        if l.startswith("{")]
                print(line[-1] if line else
                      json.dumps({"stage": stage, "grwin": w,
                                  "error": out.stderr[-200:]}),
                      flush=True)
        return

    B = args.batch
    for stage in ("module_fwd", "module_bwd", "sampler_fwd", "sampler_bwd"):
        ms = module_stage(cfg, B, stage)
        print(json.dumps({"stage": stage, "ms": round(ms, 2), "batch": B}),
              flush=True)


if __name__ == "__main__":
    main()
