"""Compute-isolated microbench for the fused-kernel building blocks.

Times each block of the fused conv kernel (radial MLP, CG contraction,
one-hot scatter matmul) with a CONSTANT input block (index_map -> (0, 0)),
so streaming is a single DMA and the grid measures pure per-chunk compute.
Use to decide tile sizes / precision on real hardware.

Measurement rules for the axon tunnel (see ROUND2_NOTES.md):
* never jit a 0-arg closure over big arrays (MLIR-constant transfers);
* sync with np.asarray(out[0, 0]) — block_until_ready returns early;
* transient RESOURCE_EXHAUSTED / multi-minute hangs = tenant congestion,
  re-run later.

Usage: python tools/kernel_microbench.py [--grid 2048] [--rows 128] [--be 256]
"""

import argparse
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import nequip_tpu.ops.pallas.tp_scatter as K
from nequip_tpu.ops import Irreps, TensorProduct, uvu_instructions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=2048)
    ap.add_argument("--rows", type=int, default=128)
    ap.add_argument("--be", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument(
        "--only", type=str, default="",
        help="comma-separated variant filter (substring match), e.g. '_t,xpose'",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="run on host CPU in interpret mode (JAX_PLATFORMS env is "
        "overridden by the axon plugin; this uses jax.config directly)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    rows, be, G = args.rows, args.be, args.grid

    feats = Irreps("32x0e+32x1e+32x2e")
    sh = Irreps.spherical_harmonics(2)
    mid, ins = uvu_instructions(feats, sh, feats)
    tp = TensorProduct(feats, sh, mid, ins, shared_weights=False)
    plan = K._TPPlan(tp)
    n_emb, H, WN = 8, 128, plan.weight_numel
    print(f"dims: in={plan.dim_in} mid={plan.mid_dim} WN={WN} rows={rows} be={be} G={G}")

    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.standard_normal((be, plan.dim_in)), jnp.float32)
    yb = jnp.asarray(rng.standard_normal((be, plan.sh_dim)), jnp.float32)
    eb = jnp.asarray(rng.standard_normal((be, n_emb)), jnp.float32)
    rel = jnp.asarray(rng.randint(0, rows, (be, 1)), jnp.int32)
    w1 = jnp.asarray(rng.standard_normal((n_emb, H)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((H, WN)) * 0.1, jnp.float32)

    only = [s for s in args.only.split(",") if s]

    def timeit(name, fn):
        if only and not any(s in name for s in only):
            return
        try:
            o = fn()
            np.asarray(o[0, 0])
        except Exception as e:  # congestion or VMEM OOM — report, don't die
            print(f"{name}: FAIL {type(e).__name__} {str(e)[:110]}", flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(args.reps):
            o = fn()
        np.asarray(o[0, 0])
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{name}: {ms:.2f} ms  ({ms / G * 1e3:.2f} us/chunk)", flush=True)

    def make(variant, prec):
        def _k(x_ref, y_ref, emb_ref, rel_ref, w1_ref, w2_ref, out_ref, msg_ref, w_ref):
            g = pl.program_id(0)

            @pl.when(g == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            if variant in ("mlp", "full"):
                h = jnp.dot(emb_ref[:], w1_ref[:], preferred_element_type=jnp.float32, precision=prec)
                h = jax.nn.silu(h)
                w_ref[:] = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32, precision=prec).astype(w_ref.dtype)
                if variant == "mlp":
                    out_ref[:1, :WN] += w_ref[:1]
                    return
            if variant in ("cg", "full"):
                wv = (
                    w_ref[:]
                    if variant == "full"
                    else jnp.broadcast_to(x_ref[:, :1], (be, WN)).astype(jnp.float32)
                )
                K._compute_tp_block(plan, x_ref[:], y_ref[:], wv, msg_ref)
                if variant == "cg":
                    out_ref[:1] += msg_ref[:1]
                    return
            if variant == "dot":
                msg_ref[:] = jnp.broadcast_to(x_ref[:, :1], msg_ref.shape).astype(msg_ref.dtype)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (be, rows), 1)
            S = (row_ids == rel_ref[:]).astype(out_ref.dtype)
            out_ref[:] += jax.lax.dot_general(
                S, msg_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(out_ref.dtype)

        def call(xb_, yb_, eb_, rel_, w1_, w2_):
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((be, plan.dim_in), lambda g: (0, 0)),
                    pl.BlockSpec((be, plan.sh_dim), lambda g: (0, 0)),
                    pl.BlockSpec((be, n_emb), lambda g: (0, 0)),
                    pl.BlockSpec((be, 1), lambda g: (0, 0)),
                    pl.BlockSpec((n_emb, H), lambda g: (0, 0)),
                    pl.BlockSpec((H, WN), lambda g: (0, 0)),
                ],
                out_specs=pl.BlockSpec((rows, plan.mid_dim), lambda g: (0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((be, plan.mid_dim), jnp.float32),
                    pltpu.VMEM((be, WN), jnp.float32),
                ],
            )
            return pl.pallas_call(
                _k, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((rows, plan.mid_dim), jnp.float32),
                interpret=(jax.default_backend() == "cpu"),
            )(xb_, yb_, eb_, rel_, w1_, w2_)

        f = jax.jit(call)
        return lambda: f(xb, yb, eb, rel, w1, w2)

    def make_bwd(prec):
        """The CG-VJP block (the backward kernel's VPU-bound core) on a
        constant chunk: dy/dx/dw cotangents per chunk."""
        gb = jnp.asarray(
            np.random.RandomState(1).standard_normal((be, plan.mid_dim)), jnp.float32
        )

        def _k(x_ref, y_ref, g_ref, w_ref_in, dx_ref, dy_ref, dw_scr):
            g = pl.program_id(0)

            @pl.when(g == 0)
            def _():
                dx_ref[:] = jnp.zeros_like(dx_ref)

            K._compute_tp_bwd_block(
                plan, x_ref[:], y_ref[:], w_ref_in[:], g_ref[:], dx_ref, dy_ref, dw_scr
            )

        wfull = jnp.asarray(
            np.random.RandomState(2).standard_normal((be, WN)), jnp.float32
        )

        def call(xb_, yb_, gb_, wf_):
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((be, plan.dim_in), lambda g: (0, 0)),
                    pl.BlockSpec((be, plan.sh_dim), lambda g: (0, 0)),
                    pl.BlockSpec((be, plan.mid_dim), lambda g: (0, 0)),
                    pl.BlockSpec((be, WN), lambda g: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((be, plan.dim_in), lambda g: (0, 0)),
                    pl.BlockSpec((be, plan.sh_dim), lambda g: (0, 0)),
                ],
                scratch_shapes=[pltpu.VMEM((be, WN), jnp.float32)],
            )
            return pl.pallas_call(
                _k, grid_spec=gs,
                out_shape=[
                    jax.ShapeDtypeStruct((be, plan.dim_in), jnp.float32),
                    jax.ShapeDtypeStruct((be, plan.sh_dim), jnp.float32),
                ],
                interpret=(jax.default_backend() == "cpu"),
            )(xb_, yb_, gb_, wf_)

        f = jax.jit(lambda *a: call(*a)[0])
        return lambda: f(xb, yb, gb, wfull)

    # ---- transposed (edge-on-lanes) variants: the lane-packing candidate --
    xb_t = jnp.asarray(np.asarray(xb).T)          # [dim_in, be]
    yb_t = jnp.asarray(np.asarray(yb).T)          # [sh_dim, be]
    w1_t = jnp.asarray(np.asarray(w1).T)          # [H, n_emb]
    w2_t = jnp.asarray(np.asarray(w2).T)          # [WN, H]
    wfull_t = jnp.asarray(
        np.random.RandomState(2).standard_normal((WN, be)), jnp.float32
    )

    def make_t(variant, prec):
        """Transposed-layout blocks.  ``xpose``: per-chunk [be, dim] -> [dim, be]
        transpose alone; ``cg_t``: transposed CG on pre-transposed inputs;
        ``full_t``: in-kernel transposes + transposed MLP + CG + scatter
        dot_general back to [rows, mid]."""

        def _k(x_ref, y_ref, emb_ref, rel_ref, xt_ref, yt_ref, wt_ref,
               w1t_ref, w2t_ref, out_ref, msg_t_ref):
            g = pl.program_id(0)

            @pl.when(g == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            if variant == "xpose":
                x_t = x_ref[:].T
                out_ref[:1, :1] += x_t[:1, :1]
                return
            if variant == "cg_t":
                K._compute_tp_block_T(plan, xt_ref[:], yt_ref[:], wt_ref[:], msg_t_ref)
                out_ref[:1, :1] += msg_t_ref[:1, :1]
                return
            if variant == "full_t":
                x_t = x_ref[:].T
                y_t = y_ref[:].T
                emb_t = emb_ref[:].T
            else:  # full_t_pre: inputs already transposed (isolate xpose cost)
                x_t, y_t = xt_ref[:], yt_ref[:]
                emb_t = emb_ref[:].T
            h_t = jnp.dot(w1t_ref[:], emb_t, preferred_element_type=jnp.float32,
                          precision=prec)
            h_t = jax.nn.silu(h_t)
            w_t = jnp.dot(w2t_ref[:], h_t, preferred_element_type=jnp.float32,
                          precision=prec).astype(jnp.float32)
            K._compute_tp_block_T(plan, x_t, y_t, w_t, msg_t_ref)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (be, rows), 1)
            S = (row_ids == rel_ref[:]).astype(out_ref.dtype)
            # contract over the edge dim: S [be, rows] x msg_t [mid, be]
            out_ref[:] += jax.lax.dot_general(
                S, msg_t_ref[:], dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ).astype(out_ref.dtype)

        def call(xb_, yb_, eb_, rel_, xbt_, ybt_, wft_, w1t_, w2t_):
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((be, plan.dim_in), lambda g: (0, 0)),
                    pl.BlockSpec((be, plan.sh_dim), lambda g: (0, 0)),
                    pl.BlockSpec((be, n_emb), lambda g: (0, 0)),
                    pl.BlockSpec((be, 1), lambda g: (0, 0)),
                    pl.BlockSpec((plan.dim_in, be), lambda g: (0, 0)),
                    pl.BlockSpec((plan.sh_dim, be), lambda g: (0, 0)),
                    pl.BlockSpec((WN, be), lambda g: (0, 0)),
                    pl.BlockSpec((H, n_emb), lambda g: (0, 0)),
                    pl.BlockSpec((WN, H), lambda g: (0, 0)),
                ],
                out_specs=pl.BlockSpec((rows, plan.mid_dim), lambda g: (0, 0)),
                scratch_shapes=[pltpu.VMEM((plan.mid_dim, be), jnp.float32)],
            )
            return pl.pallas_call(
                _k, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((rows, plan.mid_dim), jnp.float32),
                interpret=(jax.default_backend() == "cpu"),
            )(xb_, yb_, eb_, rel_, xbt_, ybt_, wft_, w1t_, w2t_)

        f = jax.jit(call)
        return lambda: f(xb, yb, eb, rel, xb_t, yb_t, wfull_t, w1_t, w2_t)

    def make_bwd_t(prec):
        gb_t = jnp.asarray(
            np.random.RandomState(1).standard_normal((plan.mid_dim, be)), jnp.float32
        )

        def _k(xt_ref, yt_ref, gt_ref, wt_ref, dxt_ref, dyt_ref, dwt_scr):
            g = pl.program_id(0)

            @pl.when(g == 0)
            def _():
                dxt_ref[:] = jnp.zeros_like(dxt_ref)

            K._compute_tp_bwd_block_T(
                plan, xt_ref[:], yt_ref[:], wt_ref[:], gt_ref[:],
                dxt_ref, dyt_ref, dwt_scr,
            )

        def call(xbt_, ybt_, gbt_, wft_):
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(G,),
                in_specs=[
                    pl.BlockSpec((plan.dim_in, be), lambda g: (0, 0)),
                    pl.BlockSpec((plan.sh_dim, be), lambda g: (0, 0)),
                    pl.BlockSpec((plan.mid_dim, be), lambda g: (0, 0)),
                    pl.BlockSpec((WN, be), lambda g: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((plan.dim_in, be), lambda g: (0, 0)),
                    pl.BlockSpec((plan.sh_dim, be), lambda g: (0, 0)),
                ],
                scratch_shapes=[pltpu.VMEM((WN, be), jnp.float32)],
            )
            return pl.pallas_call(
                _k, grid_spec=gs,
                out_shape=[
                    jax.ShapeDtypeStruct((plan.dim_in, be), jnp.float32),
                    jax.ShapeDtypeStruct((plan.sh_dim, be), jnp.float32),
                ],
                interpret=(jax.default_backend() == "cpu"),
            )(xbt_, ybt_, gbt_, wft_)

        f = jax.jit(lambda *a: call(*a)[0])
        return lambda: f(xb_t, yb_t, gb_t, wfull_t)

    HP, DP = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT
    for v in ("dot", "mlp", "cg", "full"):
        timeit(f"{v} HIGHEST", make(v, HP))
        timeit(f"{v} DEFAULT", make(v, DP))
    timeit("cgvjp (bwd core)", make_bwd(HP))
    for v in ("xpose", "cg_t", "full_t", "full_t_pre"):
        timeit(f"{v} DEFAULT", make_t(v, DP))
    timeit("cgvjp_t (bwd core)", make_bwd_t(HP))
    flop_dot = G * be * rows * plan.mid_dim * 2
    flop_mlp = G * be * (n_emb * H + H * WN) * 2
    print(
        f"theory: dot {flop_dot/1e9:.0f} GF "
        f"(14TF/s={flop_dot/14e12*1e3:.1f}ms, 22TF/s={flop_dot/22e12*1e3:.1f}ms); "
        f"mlp {flop_mlp/1e9:.0f} GF"
    )


if __name__ == "__main__":
    main()
