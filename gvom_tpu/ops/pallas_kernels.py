"""Pallas TPU kernels for the hot ops.

ray_pass_counts_matmul — the reference's per-point atomic DDA march
(gvom.py:1091-1150) recast as MXU work:

Every ray starts at the ego, and each DDA step advances the dominant axis by
exactly ±1 voxel (step_dom = s_dom/|s_dom| = ±1 in IEEE f32). Group rays by
(dominant axis, sign): within a group, ALL rays occupy the same dominant-axis
cell at step s. The march therefore reduces to, per (group, step), a 2D
histogram of the two non-dominant coordinates — computed as a one-hot matmul
with bf16 one-hots generated in VMEM (0/1 values are exact in bf16; the MXU
accumulates in f32, so counts are exact integers).

Rays are sorted by (group, descending step budget) so each group's rays that
are still alive at step s form a prefix — the kernel's inner chunk loop runs
only over that prefix (counts are computed up front with a small one-hot
matmul histogram), skipping dead work.

The final placement of per-step histograms into the 3D grid is itself a
one-hot matmul over the (tiny) step axis, using dominant-cell rows computed
with exactly the same f32 expression as the XLA fallback — no scatter
anywhere in the path.

Env knob status (r5, after the lane-dense layout decision settled which
paths survive — VERDICT r4 ask #7):

  LOAD-BEARING (default path depends on them):
    GVOM_RAY_CHUNK / GVOM_RAY_CHUNK_FAR — worklist chunk quanta (Mosaic's
        1024 dynamic-slice alignment floor; see their comments)
    GVOM_OH_IDX / GVOM_OH_VAL            — one-hot compare/operand dtypes
        (int32 / bf16 defaults measured fastest on v5e)
    GVOM_RAY_TIER64                      — mod-64 near tier, DEFAULT ON
    GVOM_MOM_XB / GVOM_MOM_CHUNK         — moments kernel block/chunk
    GVOM_MOM_PRECISION                   — f32 default (single-bf16-pass
        dots; mom ≈ 4e-4 rel on-chip, debug-eigen consumers only)
    GVOM_CMB_XB                          — fused-combine x-block (W=4
        fastest measured; the combine is default-fused on TPU since r5)
  ARCHIVAL (measured dead ends, kept off + exactness-pinned under the
  `archival` pytest marker as the record of the measurement):
    GVOM_RAY_STEPPAIR — r4 loss (narrow-M rate cancels the row halving)
    GVOM_RAY_TIER32   — r4 no-gain (M=64 is the v5e packing floor)
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gvom_tpu.config import GvomConfig
from gvom_tpu.ops import raycast as raycast_mod

__all__ = ["use_fast_path", "ray_pass_counts_matmul"]

def _env_chunk(name: str, default: str) -> int:
    """Chunk sizes must be positive multiples of 128: the kernels rely on
    pl.multiple_of alignment hints and chunk-aligned padding."""
    raw = os.environ.get(name, default)
    try:
        v = int(raw)
    except ValueError:
        raise ValueError(f"{name}={raw!r}: must be an integer multiple of 128")
    if v <= 0 or v % 128 != 0:
        raise ValueError(f"{name}={raw!r}: must be a positive multiple of 128")
    return v


def _env_choice(name: str, default: str, allowed) -> str:
    v = os.environ.get(name, default)
    if v not in allowed:
        raise ValueError(f"{name}={v!r}: must be one of {sorted(allowed)}")
    return v


_CHUNK = _env_chunk("GVOM_RAY_CHUNK", "1024")
             # rays per inner matmul; K-dim of the one-hot matmul
_CHUNK_FAR = _env_chunk("GVOM_RAY_CHUNK_FAR", "1024")
             # chunk for the far-step tier + z groups, whose live counts per
             # (group, step) are far below _CHUNK. Matmul wall scales with
             # rows streamed, so padding rows are waste there — but Mosaic
             # requires 1-D dynamic VMEM slices to be provably 1024-aligned
             # (8 sublanes × 128 lanes), so sub-1024 chunks fail to compile
             # on v5e ("cannot statically prove index is a multiple of 1024");
             # the knob exists for targets that lift that constraint.

_OH_IDX = {"int16": jnp.int16, "int32": jnp.int32}[
    _env_choice("GVOM_OH_IDX", "int32", ("int16", "int32"))]
                     # index dtype of the one-hot equality compares (the
                     # [K, U] iota-vs-coordinate compares are the kernel's
                     # dominant VPU cost; int16 packs 2/lane)

_OH_VAL = {"int8": jnp.int8, "bf16": jnp.bfloat16}[
    _env_choice("GVOM_OH_VAL", "bf16", ("int8", "bf16"))]
                     # value dtype of the raycast one-hot matmul operands.
                     # 0/1 is exact in every candidate dtype and counts
                     # accumulate exactly in the 24-bit f32 significand (K per
                     # matmul is far below 2^24). bf16 is the default: v5e's
                     # MXU takes bf16 natively, while int8 dot_generals lower
                     # to VPU emulation under Mosaic (measured ~4× slower on
                     # the far-tier histograms).

_RAY_STEPPAIR = os.environ.get("GVOM_RAY_STEPPAIR", "0") == "1"
                     # step-PAIRED mod-64 near tier (r4): two consecutive
                     # steps ride ONE matmul row — A = [u_s | u_s+1] and
                     # B = [v_s | v_s+1] half-packed one-hots, quadrants
                     # (0,0)/(1,1) of the [128,128] product are the two step
                     # hists and the cross quadrants are discarded. Halves
                     # the rows streamed through the MXU for steps 1..30.
                     # MEASURED A LOSS on v5e (raycast 6.85 → 10.3 ms/scan):
                     # the M=64 group-paired tier already streams ~0.8
                     # cycles/row — the MXU runs narrow-M bf16 histograms at
                     # ~2 rows/cycle, so doubling M to 128 cancels the row
                     # halving and the doubled one-hot builds become pure
                     # overhead. Kept off as a documented dead end
                     # (BENCHMARKS.md r4); the kernel stays exact-tested.

_RAY_TIER32 = os.environ.get("GVOM_RAY_TIER32", "0") == "1"
                     # experimental r4 probe: mod-32 tier for steps 1..15 —
                     # if narrow-M row packing extends to M=32 (4 rows/cycle)
                     # the densest steps halve again. Measured on v5e before
                     # any default flip (see BENCHMARKS.md).

_RAY_TIER64 = os.environ.get("GVOM_RAY_TIER64", "1") == "1"  # mod-64 near
                     # tier for raycast steps 1..31 (exactness pinned in
                     # tests). Default ON since r3: the block-write placement
                     # removed the per-tier placement matmuls that made it
                     # break-even in r2 — now a measured −0.33 ms/scan on v5e
                     # (82.2 → 84.5 scans/s contract mode). GVOM_RAY_TIER64=0
                     # restores the two-tier layout.


def use_fast_path() -> bool:
    """True only on TPU — these are Mosaic/TPU kernels; any other backend
    (CPU, GPU) must take the XLA implementations."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


_SLAB_THRESH = (0, 16, 32, 64, 128) if os.environ.get(
    "GVOM_SLAB_BUCKETS", "1") == "1" else (0,)
                    # slab ingest: entry-step bucket thresholds for the
                    # x-dominant pair (SURVEY §2.3 item 2) — bucket b holds
                    # rays whose first-possible-slab-step is ≥ THRESH[b], and
                    # the kernel streams bucket b only from that step on,
                    # killing the pre-slab head of the r3/r4 slab constant.
                    # EXPONENTIAL boundaries: each active (step, bucket) pair
                    # pays the 1024-row chunk-alignment floor, so fewer,
                    # wider buckets beat a linear grid (the late-entry rays
                    # carry nearly all the recoverable waste).

_SBLOCK_XY = 33  # steps per grid instance. TPU pays ~26µs fixed cost per grid
_SBLOCK_Z = 22   # instance AND per separate step-body (measured on v5e), so
                 # each instance runs ONE flattened worklist loop over its
                 # (step, chunk) pairs — steps without live rays cost nothing.
                 # Blocks sized so the [1, SB, U, n_sub·V] f32 out block stays
                 # a few MB (vmem_limit_bytes raised above the 16 MB default).


def _hist_kernel_factory(SB: int, PAIRED: bool, U_GRID: int, S_OFF: int, CHUNK: int,
                         RELABEL: bool = False, U_RAW: bool = False,
                         V_GRID: int = None, BUCKETS: int = 1, THRESH=(0,)):
    def kernel(meta_ref, startuv_ref, utgt_ref, vtgt_ref, su_ref, sv_ref, out_ref, aj_ref, ac_ref):
        """One (group-pair, step-block) instance.

        When PAIRED, each instance covers groups (2a, 2a+1): their chunks are
        stacked along the contraction dim and the two z one-hots occupy
        disjoint column halves (block-diagonal B), so one [U, 2V] matmul
        serves both groups — N=2V=128 fills the MXU, halving pass count vs
        per-group N=64 matmuls.

        Inner-body layout (perf-critical): the pair's two chunks are fused at
        the 1-D vector level (cheap [2·CHUNK] concats + per-half scalar
        selects), so each iteration builds exactly ONE u one-hot and ONE v
        one-hot and issues ONE int8 MXU matmul with int32 accumulation
        (counts are exact; int8 runs at 2× bf16 on v5e). The (step, chunk)
        worklist is flattened into ONE fori_loop driven by an SMEM-scratch
        active-step table built once per instance — per-iteration index math
        is O(1) scalar ops via an SMEM active-step table.

        meta_ref (SMEM): [G, (S+1)·BUCKETS, 6] int32 (abase, nchunks, first,
        count, dom_ok, step), row = step·BUCKETS + bucket. With RELABEL the
        row index is a LOCAL output row (the sharded slab ingest's
        slab-local dominant row) and the absolute step comes from column 5
        per half; without it the row index IS the step and column 5 is
        redundant. BUCKETS > 1 (the slab ingest's entry-bucketed worklist,
        SURVEY §2.3 item 2): rays are segmented by their quantized
        slab-ENTRY step e//QSTEP, each (step, bucket ≤ s//QSTEP) iterates
        that bucket's live-kmax prefix — rays whose slab entry is provably
        after s are never streamed, killing the pre-slab head.
        utgt/vtgt (VMEM): [1, UO] / [1, n_sub·V] int32 one-hot column
        targets. Full-grid callers pass iotas (plain window coordinates);
        the slab caller passes the slab's torus→window column map, which
        makes the one-hot itself select only slab columns.
        startuv_ref (SMEM): [G, 2] f32 — start_rel components on the (u, v)
        axes. Hist columns are WINDOW-relative (the caller torus-rolls the
        final placed grid once).
        su/sv (VMEM): [Npad] f32 ray slopes, group-sorted by descending kmax —
        rays in [first, first+count) are exactly those still live at step s
        (count = #rays with exact kmax ≥ s), so no per-ray budget test exists
        in the kernel at all.
        out_ref (VMEM): [1, SB, U, n_sub*V] f32
        aj/ac (SMEM scratch): [SB+2] i32 active-step table (local step id,
        cumulative chunk count).
        """
        a = pl.program_id(0)
        sb = pl.program_id(1)
        # UO: one-hot/hist column count. When UO < U_GRID (the windowed
        # near-step tier), columns are u mod UO — injective because at step s
        # the non-dominant coordinate u = floor(start_u + s·su) with |su| ≤ 1
        # spans at most 2s+1 ≤ UO−2 cells; the caller untiles with a
        # window mask. Halves the matmul M and the ohu build for the
        # near steps that carry ~85% of the live chunks.
        UO = out_ref.shape[2]
        n_sub = 2 if PAIRED else 1
        V = out_ref.shape[3] // n_sub
        K = n_sub * CHUNK
        iuf = utgt_ref[0][None, :].astype(_OH_IDX)     # [1, UO]
        iv2 = vtgt_ref[0][None, :].astype(_OH_IDX)     # [1, n_sub*V]
        rows = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)[:, 0]
        half1 = rows >= CHUNK               # second half ⇔ pair's odd group
        rin = rows % CHUNK
        npad = su_ref.shape[0]
        if PAIRED:
            g0, g1 = 2 * a, 2 * a + 1
        else:
            g0 = g1 = a

        def sel(a0, a1):
            """Per-row scalar select: group g0's value on the first chunk
            half, g1's on the second."""
            if not PAIRED:
                return a0
            return jnp.where(half1, a1, a0)

        for j in range(SB):
            out_ref[0, j] = jnp.zeros((UO, n_sub * V), jnp.float32)

        # active-step table: aj[t] = local step of t-th active step, ac[t] =
        # chunks before it. Built once; steps with no live rays are skipped
        # entirely, and active steps have ≥1 chunk so the in-loop pointer
        # advances by at most one per iteration.
        t_cnt = jnp.int32(0)
        cum = jnp.int32(0)
        for j in range(SB):
            # without RELABEL the table row IS the (1-based) step; with it,
            # rows are slab-local output rows and the step rides in meta[...,5]
            s = (j + 1) if RELABEL else (S_OFF + sb * SB + j + 1)
            for b in range(BUCKETS):
                row = s * BUCKETS + b
                nch = jnp.maximum(meta_ref[g0, row, 1], meta_ref[g1, row, 1])
                act0 = (meta_ref[g0, row, 3] > 0) & (meta_ref[g0, row, 4] > 0)
                act1 = (meta_ref[g1, row, 3] > 0) & (meta_ref[g1, row, 4] > 0)
                w = jnp.where(act0 | act1, nch, 0)   # dom-dead steps cost nothing
                if BUCKETS > 1:
                    # bucket b's rays enter the slab at step ≥ THRESH[b]:
                    # they can contribute nothing before it (conservative)
                    w = jnp.where(s >= THRESH[b], w, 0)
                # branchless: inactive rows overwrite the CURRENT (unfilled)
                # slot, which the next active row then writes correctly —
                # t_cnt only advances on active rows
                aj_ref[t_cnt] = j * BUCKETS + b
                ac_ref[t_cnt] = cum
                t_cnt = t_cnt + (w > 0).astype(jnp.int32)
                cum = cum + w
        ac_ref[t_cnt] = cum                  # sentinel: never advance past end

        def body(i, t):
            t = t + (i >= ac_ref[t + 1]).astype(jnp.int32)
            jb = aj_ref[t]
            j = jb // BUCKETS
            c = i - ac_ref[t]
            if RELABEL:
                s = j + 1
                row = s * BUCKETS + jb % BUCKETS
                # absolute step per HALF (the two groups hit a slab row at
                # different steps); exact integers, so the f32 cast is exact
                sf = sel(meta_ref[g0, row, 5], meta_ref[g1, row, 5]).astype(jnp.float32)
            else:
                s = S_OFF + sb * SB + j + 1
                row = s * BUCKETS + jb % BUCKETS
                sf = s.astype(jnp.float32)
            ab0, ab1 = meta_ref[g0, row, 0], meta_ref[g1, row, 0]
            nc = sel(meta_ref[g0, row, 1], meta_ref[g1, row, 1])
            first = sel(meta_ref[g0, row, 2], meta_ref[g1, row, 2])
            count = sel(meta_ref[g0, row, 3], meta_ref[g1, row, 3])
            dom_ok = sel(meta_ref[g0, row, 4], meta_ref[g1, row, 4])
            start_u = sel(startuv_ref[g0, 0], startuv_ref[g1, 0])
            start_v = sel(startuv_ref[g0, 1], startuv_ref[g1, 1])
            voff = sel(jnp.int32(0), jnp.int32(V))
            # clamp: the pair iterates to max(nchunks) — the smaller group's
            # base must stay in bounds (lanes masked dead)
            base0 = pl.multiple_of(jnp.minimum(ab0 + c * CHUNK, npad - CHUNK), CHUNK)
            if PAIRED:
                base1 = pl.multiple_of(jnp.minimum(ab1 + c * CHUNK, npad - CHUNK), CHUNK)
                su = jnp.concatenate([su_ref[pl.ds(base0, CHUNK)], su_ref[pl.ds(base1, CHUNK)]])
                sv = jnp.concatenate([sv_ref[pl.ds(base0, CHUNK)], sv_ref[pl.ds(base1, CHUNK)]])
                gi = jnp.where(half1, base1, base0) + rin
            else:
                su = su_ref[pl.ds(base0, CHUNK)]
                sv = sv_ref[pl.ds(base0, CHUNK)]
                gi = base0 + rin
            u = jnp.floor(start_u + sf * su).astype(jnp.int32)
            v = jnp.floor(start_v + sf * sv).astype(jnp.int32)
            live = (c < nc) & (dom_ok > 0) & (gi >= first) & (gi < first + count)
            okv = live & (v >= 0) & (v < (V_GRID if V_GRID is not None else V))
            vv = jnp.where(okv, v + voff, -1).astype(_OH_IDX)
            ohv = (vv[:, None] == iv2).astype(_OH_VAL)

            oku = okv & (u >= 0) & (u < U_GRID)
            if UO < U_GRID and not U_RAW:
                # UO is a power of two; mod compiles to a lane AND
                uu = jnp.where(oku, jax.lax.rem(u, jnp.int32(UO)), -1)
            else:
                uu = jnp.where(oku, u, -1)
            ohu = (uu.astype(_OH_IDX)[:, None] == iuf).astype(_OH_VAL)
            acc_t = jnp.int32 if _OH_VAL == jnp.int8 else jnp.float32
            p = jax.lax.dot_general(
                ohu, ohv, (((0,), (0,)), ((), ())), preferred_element_type=acc_t
            )
            out_ref[0, j] = out_ref[0, j] + p.astype(jnp.float32)
            return t

        jax.lax.fori_loop(0, cum, body, jnp.int32(0))

    return kernel


def _run_hist(meta, startuv, su, sv, G, S, U, V, interpret=False, paired=True,
              SB=_SBLOCK_XY, u_mod=None, s_off=0, chunk=_CHUNK,
              utgt=None, vtgt=None, relabel=False, v_out=None, v_grid=None,
              buckets=1, thresh=(0,)):
    """Histograms for steps s_off+1 .. s_off+S (meta is indexed by absolute
    step — or, with relabel, by slab-local output row, carrying the absolute
    step in its 6th column). u_mod, when set, is the mod-UO windowed column
    count — valid only for steps with 2s+1 ≤ u_mod − 2 (caller's
    responsibility). utgt/vtgt override the one-hot column targets (the slab
    callers' torus→window maps); defaults are plain iotas."""
    UO = u_mod or U
    VO = v_out or V
    S_pad = ((S + SB - 1) // SB) * SB
    if meta.ndim == 4:
        # meta arrives [G, S+1, buckets, 6]; rows flatten to step·B + bucket
        if meta.shape[1] < s_off + S_pad + 1:
            meta = jnp.pad(
                meta, ((0, 0), (0, s_off + S_pad + 1 - meta.shape[1]), (0, 0), (0, 0)))
        meta = meta.reshape(meta.shape[0], -1, 6)
    elif meta.shape[1] < s_off + S_pad + 1:
        meta = jnp.pad(meta, ((0, 0), (0, s_off + S_pad + 1 - meta.shape[1]), (0, 0)))
    n_sub = 2 if paired else 1
    n_inst = G // n_sub
    u_raw = utgt is not None
    if utgt is None:
        utgt = jnp.arange(UO, dtype=jnp.int32)
    if vtgt is None:
        vtgt = jnp.arange(n_sub * VO, dtype=jnp.int32)
    out = pl.pallas_call(
        _hist_kernel_factory(SB, paired, U, s_off, chunk, RELABEL=relabel,
                             U_RAW=u_raw, V_GRID=v_grid, BUCKETS=buckets,
                             THRESH=thresh),
        grid=(n_inst, S_pad // SB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, SB, UO, n_sub * VO), lambda a, sb: (a, sb, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_inst, S_pad, UO, n_sub * VO), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((SB * buckets + 2,), jnp.int32),
            pltpu.SMEM((SB * buckets + 2,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(meta, startuv, utgt[None, :], vtgt[None, :], su, sv)
    if paired:
        # [a, s, UO, 2V] → [2a+half, s, UO, V]
        out = out.reshape(n_inst, S_pad, UO, 2, VO).transpose(0, 3, 1, 2, 4).reshape(G, S_pad, UO, VO)
    return out[:, :S]


def _steppair_kernel_factory(NP: int, CHUNK: int, U_GRID: int, V: int):
    """One instance = one group, all NP step pairs (steps 2j+1, 2j+2).

    Each matmul row carries TWO visits: the u/v one-hots of steps s and s+1
    occupy disjoint halves of the [K,128] / [K,2V] operands, so the [128,2V]
    product's (lo,lo) quadrant is step s's hist and (hi,hi) is step s+1's;
    the cross quadrants are garbage and discarded by the caller's quadrant
    extraction. live(s+1) ⊆ live(s) is a prefix (desc-kmax sort), so one
    chunk walk at step s's width covers both steps; each step keeps its own
    count/dom_ok liveness from the shared meta table."""

    def kernel(meta_ref, startuv_ref, su_ref, sv_ref, out_ref, aj_ref, ac_ref):
        g = pl.program_id(0)
        iuf = jax.lax.broadcasted_iota(_OH_IDX, (1, 128), 1)
        ivf = jax.lax.broadcasted_iota(_OH_IDX, (1, 2 * V), 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)[:, 0]
        npad = su_ref.shape[0]
        start_u = startuv_ref[g, 0]
        start_v = startuv_ref[g, 1]

        for j in range(NP):
            out_ref[0, j] = jnp.zeros((128, 2 * V), jnp.float32)

        t_cnt = jnp.int32(0)
        cum = jnp.int32(0)
        for j in range(NP):
            s0 = 2 * j + 1
            s1 = 2 * j + 2
            nch = meta_ref[g, s0, 1]
            act0 = (meta_ref[g, s0, 3] > 0) & (meta_ref[g, s0, 4] > 0)
            act1 = (meta_ref[g, s1, 3] > 0) & (meta_ref[g, s1, 4] > 0)
            w = jnp.where(act0 | act1, nch, 0)
            aj_ref[t_cnt] = j
            ac_ref[t_cnt] = cum
            t_cnt = t_cnt + (w > 0).astype(jnp.int32)
            cum = cum + w
        ac_ref[t_cnt] = cum

        def body(i, t):
            t = t + (i >= ac_ref[t + 1]).astype(jnp.int32)
            j = aj_ref[t]
            c = i - ac_ref[t]
            s0 = 2 * j + 1
            s1 = s0 + 1
            ab = meta_ref[g, s0, 0]
            nc = meta_ref[g, s0, 1]
            first = meta_ref[g, s0, 2]
            cnt0 = meta_ref[g, s0, 3]
            cnt1 = meta_ref[g, s1, 3]
            d0 = meta_ref[g, s0, 4]
            d1 = meta_ref[g, s1, 4]
            base = pl.multiple_of(jnp.minimum(ab + c * CHUNK, npad - CHUNK), CHUNK)
            su = su_ref[pl.ds(base, CHUNK)]
            sv = sv_ref[pl.ds(base, CHUNK)]
            gi = base + rows
            sf0 = s0.astype(jnp.float32)           # exact small ints
            sf1 = s1.astype(jnp.float32)
            u0 = jnp.floor(start_u + sf0 * su).astype(jnp.int32)
            v0 = jnp.floor(start_v + sf0 * sv).astype(jnp.int32)
            u1 = jnp.floor(start_u + sf1 * su).astype(jnp.int32)
            v1 = jnp.floor(start_v + sf1 * sv).astype(jnp.int32)
            live0 = (c < nc) & (d0 > 0) & (gi >= first) & (gi < first + cnt0)
            live1 = (c < nc) & (d1 > 0) & (gi >= first) & (gi < first + cnt1)
            okv0 = live0 & (v0 >= 0) & (v0 < V)
            okv1 = live1 & (v1 >= 0) & (v1 < V)
            vv0 = jnp.where(okv0, v0, -1).astype(_OH_IDX)
            vv1 = jnp.where(okv1, v1 + V, -1).astype(_OH_IDX)
            oku0 = okv0 & (u0 >= 0) & (u0 < U_GRID)
            oku1 = okv1 & (u1 >= 0) & (u1 < U_GRID)
            uu0 = jnp.where(oku0, jax.lax.rem(u0, jnp.int32(64)), -1).astype(_OH_IDX)
            uu1 = jnp.where(oku1, jax.lax.rem(u1, jnp.int32(64)) + 64, -1).astype(_OH_IDX)
            ohu = ((uu0[:, None] == iuf) | (uu1[:, None] == iuf)).astype(_OH_VAL)
            ohv = ((vv0[:, None] == ivf) | (vv1[:, None] == ivf)).astype(_OH_VAL)
            acc_t = jnp.int32 if _OH_VAL == jnp.int8 else jnp.float32
            p = jax.lax.dot_general(
                ohu, ohv, (((0,), (0,)), ((), ())), preferred_element_type=acc_t
            )
            out_ref[0, j] = out_ref[0, j] + p.astype(jnp.float32)
            return t

        jax.lax.fori_loop(0, cum, body, jnp.int32(0))

    return kernel


def _run_hist_steppair(meta, startuv, su, sv, G, S_t, U, V, interpret=False,
                       chunk=_CHUNK):
    """Step-paired mod-64 hists for steps 1..S_t (S_t even): returns
    [G, S_t, 64, V] — quadrant-extracted and interleaved."""
    NP = S_t // 2
    if meta.shape[1] < S_t + 1:
        meta = jnp.pad(meta, ((0, 0), (0, S_t + 1 - meta.shape[1]), (0, 0)))
    out = pl.pallas_call(
        _steppair_kernel_factory(NP, chunk, U, V),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, NP, 128, 2 * V), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((G, NP, 128, 2 * V), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((NP + 2,), jnp.int32),
            pltpu.SMEM((NP + 2,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(meta, startuv, su, sv)
    h0 = out[:, :, :64, :V]                      # steps 1, 3, 5, ...
    h1 = out[:, :, 64:, V:]                      # steps 2, 4, 6, ...
    return jnp.stack([h0, h1], axis=2).reshape(G, S_t, 64, V)


def ray_pass_counts_matmul(
    cfg: GvomConfig,
    points: jnp.ndarray,
    keep: jnp.ndarray,
    ego_position: jnp.ndarray,
    origin: jnp.ndarray,
    interpret: bool = False,
    y_window=None,
) -> jnp.ndarray:
    """y_window = (ys0, Ys): accumulate only the torus y-slab [ys0, ys0+Ys)
    → output [X, Ys, Z] (matches ray_pass_counts_xla's slab form). Slab
    work scales down three ways: x/z-dominant groups cut each ray's kmax at
    its last possible slab crossing (u/v on the y axis are monotone per
    ray), y-dominant groups iterate ONLY the ≤ Ys steps whose dominant row
    lands in the slab (relabeled worklist), and the one-hot targets select
    slab columns directly so the hist/matmul width is Ys."""
    X, Y, Z = cfg.grid_shape
    S = cfg.ray_steps
    start, step, delta, budget, dom = raycast_mod.ray_geometry(cfg, points, keep, ego_position)
    start_rel = start - origin.astype(jnp.float32)
    n = points.shape[0]

    # component selects (cheap) instead of [N,3] gathers
    s0, s1, s2 = step[:, 0], step[:, 1], step[:, 2]
    s_dom = jnp.where(dom == 0, s0, jnp.where(dom == 1, s1, s2))
    group = dom * 2 + (s_dom < 0).astype(jnp.int32)       # 0..5
    su = jnp.where(dom == 0, s1, s0)                      # u axis: y for x-dom, else x
    sv = jnp.where(dom == 2, s1, s2)                      # v axis: y for z-dom, else z

    # exact per-ray step count: largest k with (k-1)*delta < budget — the
    # reference's per-step test (gvom.py:1127,1150). floor(budget/delta)+1 is
    # within ±1 of it (f32 division); two-sided multiply-test fixups make it
    # exact, so the kernel's liveness test is simply s <= kmax (replacing two
    # per-chunk VMEM streams + a per-step f32 compare).
    k0 = jnp.floor(budget / jnp.maximum(delta, 1e-20)).astype(jnp.int32) + 1
    k0f = k0.astype(jnp.float32)
    # barriered products ⇒ the fixup compares use the same mul-then-compare
    # rounding as the XLA fallback's in-body test in every graph context
    # (see the fma note in raycast.ray_pass_counts_xla)
    k0 = jnp.where(jax.lax.optimization_barrier((k0f - 1.0) * delta) >= budget, k0 - 1, k0)
    k0f = k0.astype(jnp.float32)
    k0 = jnp.where(jax.lax.optimization_barrier(k0f * delta) < budget, k0 + 1, k0)
    kmax = jnp.clip(jnp.where(budget >= 0, k0, 0), 0, S)
    # ... further bounded by grid exit: pos_a(s) = start_a + s·step_a leaves
    # [0, size_a) monotonically (convex box ⇒ exited stays exited). A +2
    # margin keeps the bound conservative against f32 rounding; the in-kernel
    # masks stay exact.
    sizes_f = jnp.array([X, Y, Z], jnp.float32)
    pos_exit = (sizes_f[None, :] - start_rel[None, :]) / jnp.where(step > 0, step, 1.0)
    neg_exit = (start_rel[None, :] + 1.0) / jnp.where(step < 0, -step, 1.0)
    per_axis = jnp.where(step > 0, pos_exit, jnp.where(step < 0, neg_exit, jnp.float32(1e9)))
    s_exit = jnp.floor(jnp.min(per_axis, axis=1)).astype(jnp.int32) + 2
    kmax = jnp.minimum(kmax, jnp.maximum(s_exit, 0))

    NB = len(_SLAB_THRESH) if y_window is not None else 1  # entry buckets (slab only)
    bucket = jnp.zeros_like(group)
    if y_window is not None:
        # slab kmax cut for the non-y-dominant groups: their y coordinate
        # u(s)/v(s) = start_y + s·sy is monotone, so the LAST step that can
        # land in the slab's (possibly wrapped) window-y interval(s) bounds
        # the useful march. Conservative ±2 margins; the in-kernel target
        # match stays exact, this only trims streamed rows (≈1/n_space).
        ys0, Ys = y_window
        sy = step[:, 1]
        u0 = start_rel[1]
        a = jnp.mod(ys0 - origin[1], Y)
        hi1 = jnp.minimum(a + Ys, Y) - 1
        hi2 = a + Ys - Y - 1                     # ≥ 0 only when the window wraps

        def exit_step(lo, hi, valid):
            lo_f, hi_f = lo.astype(jnp.float32), hi.astype(jnp.float32)
            tpos = (hi_f + 1.0 - u0) / jnp.where(sy > 0, sy, 1.0)
            tneg = (lo_f - u0) / jnp.where(sy < 0, sy, 1.0)
            t = jnp.where(sy > 0, tpos, jnp.where(sy < 0, tneg, jnp.float32(1e9)))
            in0 = (u0 >= lo_f) & (u0 < hi_f + 1.0)
            t = jnp.where(sy == 0, jnp.where(in0, jnp.float32(1e9), -1.0), t)
            t = jnp.where(valid, t, -1.0)
            return jnp.floor(jnp.minimum(t, jnp.float32(1e8))).astype(jnp.int32) + 2

        e1 = exit_step(a, hi1, True)
        e2 = exit_step(jnp.int32(0), hi2, hi2 >= 0)
        slab_cut = jnp.maximum(jnp.maximum(e1, e2), 0)
        kmax = jnp.where(dom == 1, kmax, jnp.minimum(kmax, slab_cut))

        # slab ENTRY bound (same interval geometry, entry side, −2 margin):
        # the FIRST step at which the ray's y can land in the slab. Rays are
        # bucketed by entry // _SLAB_QSTEP, and the kernel's worklist skips
        # bucket b before step b·QSTEP — the x-dominant "pre-slab head"
        # (rays streamed from step 1 while still approaching the slab,
        # ~1.9 ms of the r4 slab constant) is never streamed at all.
        def entry_step(lo, hi, valid):
            lo_f, hi_f = lo.astype(jnp.float32), hi.astype(jnp.float32)
            in0 = (u0 >= lo_f) & (u0 < hi_f + 1.0)
            tpos = (lo_f - u0) / jnp.where(sy > 0, sy, 1.0)
            tneg = (u0 - (hi_f + 1.0)) / jnp.where(sy < 0, -sy, 1.0)
            t = jnp.where(sy > 0, tpos, jnp.where(sy < 0, tneg, jnp.float32(1e9)))
            t = jnp.where(in0, 0.0, t)
            t = jnp.where(valid, t, jnp.float32(1e9))
            t = jnp.maximum(t, 0.0)
            return jnp.floor(jnp.minimum(t, jnp.float32(1e8))).astype(jnp.int32) - 2

        en1 = entry_step(a, hi1, True)
        en2 = entry_step(jnp.int32(0), hi2, hi2 >= 0)
        entry = jnp.clip(jnp.minimum(en1, en2), 0, S)
        # buckets only for the x-dominant pair (the slab constant's source;
        # y-dominant rows are already slab-relabeled, z-dominant is tiny)
        bx = jnp.zeros_like(entry)
        for thr in _SLAB_THRESH[1:]:
            bx = bx + (entry >= thr).astype(jnp.int32)
        bucket = jnp.where(dom == 0, bx, 0)

    # sort rays by (group, entry bucket, descending kmax) so each (group,
    # bucket)'s live rays at step s are a prefix; all three are recovered
    # from the key (3-operand sort). NB == 1 (full grid) degenerates to the
    # plain (group, desc kmax) order.
    key = (group * NB + bucket) * (S + 2) + (S + 1 - kmax)
    key_s, su_s, sv_s = jax.lax.sort((key, su, sv), num_keys=1)
    gb_s = key_s // (S + 2)
    group_s = gb_s // NB
    kmax_s = (S + 1) - key_s % (S + 2)

    # pad so any in-range chunk read stays in bounds; padded rays are dead
    npad = ((n + _CHUNK - 1) // _CHUNK + 1) * _CHUNK
    pad = npad - n
    su_s = jnp.pad(su_s, (0, pad))
    sv_s = jnp.pad(sv_s, (0, pad))

    # per-(group, bucket) sizes and per-(group, bucket, step) live counts via
    # small matmul hists (NB = 1 outside slab mode: identical to per-group)
    ohg = (gb_s[:, None] == jnp.arange(6 * NB)[None, :]).astype(jnp.bfloat16)
    ohk = (kmax_s[:, None] == jnp.arange(S + 1)[None, :]).astype(jnp.bfloat16)
    alive_mask = (kmax_s > 0).astype(jnp.bfloat16)
    cnt_gbk = jax.lax.dot_general(
        ohg * alive_mask[:, None], ohk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.int32)                                    # [6·NB, S+1]
    live_gbs = jnp.flip(jnp.cumsum(jnp.flip(cnt_gbk, axis=1), axis=1), axis=1)  # kmax >= s
    sizes_gb = jax.lax.dot_general(
        ohg, jnp.ones((n, 1), jnp.bfloat16), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )[:, 0].astype(jnp.int32)                              # [6·NB] all rays (incl dead)
    offsets_gb = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes_gb)[:-1]])
    # group-level views for the un-bucketed consumers: buckets are contiguous
    # within a group, so a group's segment starts at its bucket 0. (For
    # bucketed groups the group-level kmax-prefix property does NOT hold —
    # only the slab x-dominant meta below uses those, bucketed.)
    offsets = offsets_gb[::NB]
    live_gs = live_gbs.reshape(6, NB, S + 1).sum(axis=1)

    # dominant-axis cell rows per (group, step) in INTEGER arithmetic:
    # floor(start_rel_dom) ± s — the exact value of floor(start_dom + s·(±1)),
    # which an f32 sum can miss by one row on knife-edge starts (half-ulp
    # below an integer, sum crossing a binade). Same convention as the XLA
    # fallback and the numpy oracle, and already what place_axis assumes.
    s_ari = jnp.arange(1, S + 1, dtype=jnp.int32)
    dom_axis = jnp.array([0, 0, 1, 1, 2, 2])
    dom_sign_i = jnp.array([1, -1, 1, -1, 1, -1], jnp.int32)
    dom_size = jnp.array([X, X, Y, Y, Z, Z])
    start_i = jnp.floor(start_rel).astype(jnp.int32)
    rows = start_i[dom_axis][:, None] + dom_sign_i[:, None] * s_ari[None, :]
    rows_ok = (rows >= 0) & (rows < dom_size[:, None])     # [6, S]
    if y_window is not None:
        # y-dominant groups: only steps whose dominant row lands in the
        # torus slab do any work (the relabeled worklist below iterates
        # exactly those)
        slab_r = jnp.mod(rows[2:4] + origin[1], Y) - ys0   # [2, S] slab-local row
        slab_hit = (slab_r >= 0) & (slab_r < Ys)
        rows_ok = rows_ok.at[2:4].set(rows_ok[2:4] & slab_hit)
    # hist u/v columns and these rows are all WINDOW-relative; the placed
    # grid is torus-rolled once at the end (cheaper than per-column mod
    # remaps inside the kernel)

    startuv = jnp.stack(
        [
            jnp.stack([start_rel[1], start_rel[2]]),  # x+ : (y, z)
            jnp.stack([start_rel[1], start_rel[2]]),  # x-
            jnp.stack([start_rel[0], start_rel[2]]),  # y+ : (x, z)
            jnp.stack([start_rel[0], start_rel[2]]),  # y-
            jnp.stack([start_rel[0], start_rel[1]]),  # z+ : (x, y)
            jnp.stack([start_rel[0], start_rel[1]]),  # z-
        ],
        axis=0,
    )
    step_col = jnp.arange(1, S + 1, dtype=jnp.int32)

    def build_meta(groups, chunk=_CHUNK):
        m = []
        for g in groups:
            off = jnp.broadcast_to(offsets[g], (S,))
            cnts = live_gs[g, 1:]                        # live rays at step s (s=1..S)
            abase = (off // chunk) * chunk               # aligned window start
            nchunks = (off + cnts - abase + chunk - 1) // chunk
            ok = rows_ok[g].astype(jnp.int32)
            m.append(jnp.stack([abase, nchunks, off, cnts, ok, step_col], axis=1))
        meta = jnp.stack(m, axis=0)                       # [G, S, 6]
        # kernel indexes meta[g, s] with s 1-based → prepend a dummy row
        return jnp.concatenate([jnp.zeros((len(groups), 1, 6), jnp.int32), meta], axis=1)

    def place_axis(h_pos, h_neg, axis_start, size):
        # h_pos/h_neg: [S_a, A, B] hists of the +1 / −1 sign groups, step
        # s = 1..S_a at row x0 + s / x0 − s (x0 = floor of the start coord)
        S_a = h_pos.shape[0]
        x0 = jnp.floor(axis_start).astype(jnp.int32)
        blk = jnp.concatenate(
            [jnp.flip(h_neg, 0), jnp.zeros((1,) + h_pos.shape[1:], h_pos.dtype), h_pos], 0
        )  # row j ↔ window row x0 − S_a + j
        xw = x0 - S_a + jnp.arange(2 * S_a + 1)
        blk = blk * ((xw >= 0) & (xw < size)).astype(blk.dtype)[:, None, None]
        zpad = jnp.zeros((size,) + h_pos.shape[1:], blk.dtype)
        blkp = jnp.concatenate([zpad, blk, zpad], 0)
        # window row x reads padded row x + size + S_a − x0. dynamic_slice's
        # own start clamping is safe: it can only bite when x0 is so far
        # outside [−S_a−1, size+S_a] that every block row was masked zero
        return jax.lax.dynamic_slice(
            blkp, (size + S_a - x0, 0, 0), (size,) + h_pos.shape[1:]
        )

    if y_window is not None:
        # ---- slab form: three calls, outputs already slab-width on y ----
        # one-hot column targets: slab torus column c ↔ window y coordinate
        # (ys0 + c − oy) mod Y — the one-hot itself selects slab columns
        ytgt = jnp.mod(ys0 + jnp.arange(Ys, dtype=jnp.int32) - origin[1], Y)

        # x-dominant pair (u = y → slab targets, v = z): entry-bucketed
        # worklist — meta rows are (step, bucket) with each bucket's own
        # chunk window; the kernel skips bucket b before step b·QSTEP
        def build_meta_bucketed(groups):
            m = []
            for g in groups:
                per_b = []
                for b in range(NB):
                    gb = g * NB + b
                    off = jnp.broadcast_to(offsets_gb[gb], (S,))
                    cnts = live_gbs[gb, 1:]
                    abase = (off // _CHUNK) * _CHUNK
                    nchunks = (off + cnts - abase + _CHUNK - 1) // _CHUNK
                    ok = rows_ok[g].astype(jnp.int32)
                    per_b.append(jnp.stack([abase, nchunks, off, cnts, ok, step_col], axis=1))
                m.append(jnp.stack(per_b, axis=1))          # [S, NB, 6]
            meta = jnp.stack(m, axis=0)                      # [G, S, NB, 6]
            return jnp.concatenate(
                [jnp.zeros((len(groups), 1, NB, 6), jnp.int32), meta], axis=1)

        meta01 = build_meta_bucketed([0, 1])
        hist01 = _run_hist(meta01, startuv[:2], su_s, sv_s, 2, S, Y, Z, interpret,
                           paired=True, SB=_SBLOCK_XY, u_mod=Ys, utgt=ytgt,
                           buckets=NB, thresh=_SLAB_THRESH)

        # y-dominant pair: relabeled worklist — row j of the output IS the
        # slab-local dominant row, meta carries each half's absolute step
        mcols, s_rows = [], []
        for g in (2, 3):
            off = jnp.broadcast_to(offsets[g], (S,))
            cnts = live_gs[g, 1:]
            abase = (off // _CHUNK) * _CHUNK
            nchunks = (off + cnts - abase + _CHUNK - 1) // _CHUNK
            hit = rows_ok[g]                     # slab-masked above
            src = jnp.stack([abase, nchunks, off, cnts,
                             hit.astype(jnp.int32), step_col], axis=1)
            r = jnp.mod(rows[g] + origin[1], Y) - ys0
            tgt = jnp.where(hit, r, Ys)          # inactive steps → dropped row
            mcols.append(jnp.zeros((Ys + 1, 6), jnp.int32).at[tgt].set(src)[:Ys])
            s_rows.append(jnp.zeros((Ys + 1,), jnp.int32).at[tgt].set(step_col)[:Ys])
        meta_rel = jnp.concatenate(
            [jnp.zeros((2, 1, 6), jnp.int32), jnp.stack(mcols)], axis=1)
        s_rows = jnp.stack(s_rows)               # [2, Ys] abs step per row (0 = dead)

        # r4: tier the relabeled rows by their ABSOLUTE step, like the
        # full-grid near tiers — a row at step s has u spanning 2s+1 cells,
        # so near rows run at u mod 64 / mod 128 (the single full-width
        # M=256 call measured 2.83 ms/scan at Ys=128, the slab ingest's
        # biggest item). Each tier call zeroes the other tiers' counts, so
        # its active-row table skips them entirely.
        def rel_tier_meta(lo_s, hi_s):
            s_col = meta_rel[:, :, 5]
            keep = (s_col >= lo_s) & (s_col <= hi_s)
            m = meta_rel.at[:, :, 3].set(jnp.where(keep, meta_rel[:, :, 3], 0))
            return m.at[:, :, 4].set(jnp.where(keep, meta_rel[:, :, 4], 0))

        if X > 128 and X % 128 == 0 and S > 8:
            xs_i = jnp.arange(X)
            lo_u = jnp.floor(startuv[2:4, 0]).astype(jnp.int32)[:, None] - s_rows
            in_win = (xs_i[None, None, :] >= lo_u[:, :, None]) & (
                xs_i[None, None, :] <= (lo_u + 2 * s_rows)[:, :, None]
            )
            hist_y = jnp.zeros((2, Ys, X, Z), jnp.float32)
            for u_mod, lo_s, hi_s in ((64, 1, 30), (128, 31, 63), (None, 64, S)):
                if lo_s > S:
                    continue
                h_t = _run_hist(rel_tier_meta(lo_s, min(hi_s, S)), startuv[2:4],
                                su_s, sv_s, 2, Ys, X, Z, interpret, paired=True,
                                SB=Ys, relabel=True, u_mod=u_mod)
                if u_mod is not None:
                    h_t = jnp.concatenate([h_t] * (X // u_mod), axis=2)
                    h_t = h_t * in_win[..., None].astype(jnp.float32)
                hist_y = hist_y + h_t
        else:
            hist_y = _run_hist(meta_rel, startuv[2:4], su_s, sv_s, 2, Ys, X, Z,
                               interpret, paired=True, SB=Ys, relabel=True)

        # z-dominant groups (u = x, v = y → slab targets)
        meta_z = build_meta([4, 5], chunk=_CHUNK_FAR)
        Szs = min(S, Z + 2)
        hist_zs = _run_hist(meta_z[:, : Szs + 1], startuv[4:], su_s, sv_s, 2, Szs,
                            X, Y, interpret, paired=False, SB=_SBLOCK_Z,
                            chunk=_CHUNK_FAR, vtgt=ytgt, v_out=Ys, v_grid=Y)

        px = place_axis(hist01[0], hist01[1], start_rel[0], X)   # [X, Ys, Z]
        py = hist_y[0] + hist_y[1]                               # [Ys, X, Z] placed
        pz = place_axis(hist_zs[0], hist_zs[1], start_rel[2], Z)  # [Z, X, Ys]
        outw = px + py.transpose(1, 0, 2) + pz.transpose(1, 2, 0)
        # x and z move to torus layout; the y axis is already the torus slab
        outw = jnp.roll(jnp.roll(outw, origin[0] % X, axis=0), origin[2] % Z, axis=2)
        return outw.astype(jnp.int32)

    # --- xy-dominant kernel: groups 0..3, hist over (u∈[0,256), v=z) ---
    # Split into windowed near tiers (mod-W u columns: at step s the u
    # coordinate spans 2s+1 ≤ W−1 cells, so mod-W is injective — shrinks the
    # matmul M and the ohu build for the near steps that carry ~85% of live
    # chunks) and a full-width far tier. The near hists are untiled by
    # replication + a per-(group, step) window mask (pure elementwise — the
    # mod-u trick costs no extra matmul). The opt-in mod-64 tier
    # (GVOM_RAY_TIER64=1) further halves steps 1..31; measured before any
    # default flip (scratch/profile_step.py).
    meta_xy = build_meta([0, 1, 2, 3])
    tiers = []  # (kind, W, s_lo, s_hi, SB): steps s_lo..s_hi at u_mod=W
    if _RAY_STEPPAIR and X > 64 and X % 64 == 0 and S >= 8:
        # r4 step-paired mod-64 tier: steps 1..30 at HALF the matmul rows
        # (two steps per row); the group-paired mod-128 tier picks up 31..63
        t0 = min(S - (S % 2), 30)
        if t0 >= 2:
            tiers.append(("sp", 64, 1, t0, 0))
        t1 = min(S, 63)
        if t1 > t0:
            tiers.append(("gp", 128, t0 + 1, t1, t1 - t0))
    elif _RAY_TIER32 and X > 64 and X % 64 == 0 and S >= 16:
        tiers.append(("gp", 32, 1, 15, 15))
        tiers.append(("gp", 64, 16, min(S, 31), min(S, 31) - 15))
        if S > 31:
            t1 = min(S, 63)
            tiers.append(("gp", 128, 32, t1, t1 - 31))
    elif _RAY_TIER64 and X > 64 and X % 64 == 0 and S >= 8:
        t0 = min(S, 31)
        tiers.append(("gp", 64, 1, t0, t0))
        if S > 31:
            t1 = min(S, 63)
            tiers.append(("gp", 128, 32, t1, t1 - 31))
    elif X > 128 and X % 128 == 0 and min(S, 63) >= 31:
        tiers.append(("gp", 128, 1, min(S, 63), 21))
    if tiers:
        ys = jnp.arange(X)
        parts = []
        for kind, W, s_lo, s_hi, SBt in tiers:
            S_t = s_hi - s_lo + 1
            if kind == "sp":
                hist_t = _run_hist_steppair(meta_xy, startuv[:4], su_s, sv_s,
                                            4, S_t, X, Z, interpret)
            else:
                hist_t = _run_hist(meta_xy, startuv[:4], su_s, sv_s, 4, S_t, X, Z,
                                   interpret, paired=True, SB=SBt, u_mod=W, s_off=s_lo - 1)
            tiled = jnp.concatenate([hist_t] * (X // W), axis=2)   # [4, S_t, X, Z]
            s_n = jnp.arange(s_lo, s_hi + 1)
            lo = jnp.floor(startuv[:4, 0]).astype(jnp.int32)[:, None] - s_n[None, :]
            in_win = (ys[None, None, :] >= lo[:, :, None]) & (
                ys[None, None, :] <= (lo + 2 * s_n[None, :])[:, :, None]
            )
            parts.append(tiled * in_win[..., None].astype(jnp.float32))
        s_done = tiers[-1][3]
        if S > s_done:
            # far steps: few live rays per (group, step) — a smaller chunk
            # cuts the rows streamed through the MXU ~4× (padding waste)
            meta_far = build_meta([0, 1, 2, 3], chunk=_CHUNK_FAR)
            parts.append(_run_hist(meta_far, startuv[:4], su_s, sv_s, 4, S - s_done, X, Z,
                                   interpret, paired=True, SB=_SBLOCK_XY, s_off=s_done,
                                   chunk=_CHUNK_FAR))
        hist_xy = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    else:
        hist_xy = _run_hist(meta_xy, startuv[:4], su_s, sv_s, 4, S, X, Z, interpret, paired=True, SB=_SBLOCK_XY)

    # --- z-dominant kernel: groups 4..5, hist over (x, y) ---
    meta_z = build_meta([4, 5], chunk=_CHUNK_FAR)
    Sz = min(S, Z + 2)
    hist_z = _run_hist(meta_z[:, : Sz + 1], startuv[4:], su_s, sv_s, 2, Sz, X, Y,
                       interpret, paired=False, SB=_SBLOCK_Z, chunk=_CHUNK_FAR)

    # --- placement: each DDA step advances the dominant axis by EXACTLY ±1
    # voxel, so floor(start_dom ± s) = floor(start_dom) ± s (both exact in
    # f32 at grid magnitudes) — step s's 2D histogram lands on one
    # CONSECUTIVE dominant-axis row. Placement is therefore a contiguous
    # block write (a dynamic-slice of the zero-padded per-step stack), not
    # the former [size, S]×[S, U·V] one-hot matmuls: zero FLOPs, one fused
    # read of the hists + one write per axis, and no bf16 operand staging.

    px = place_axis(hist_xy[0], hist_xy[1], start_rel[0], X)   # [X, Y, Z]
    py = place_axis(hist_xy[2], hist_xy[3], start_rel[1], Y)   # [Y, X, Z]
    pz = place_axis(hist_z[0], hist_z[1], start_rel[2], Z)     # [Z, X, Y]
    out = px + py.transpose(1, 0, 2) + pz.transpose(1, 2, 0)
    # everything above is window-layout; one 3-axis roll moves it to torus
    from gvom_tpu.ops import grid as gridops_mod

    return gridops_mod.window_to_torus(out.astype(jnp.int32), origin)


# ======================================================================
# Fused point binning + neighborhood moment expansion
# ======================================================================
#
# Replaces the reference's endpoint scatter (gvom.py:1084-1090) plus the
# two-pass ±eigen_dist neighborhood mean/covariance scatter
# (gvom.py:1170-1299) with ONE MXU kernel. Key identity: the contribution of
# point p to target voxel v within the support box is a polynomial in
# (p − v), and (p − v) separates per axis — so every raw-moment channel is
# Σ_p A_c[p, y]·B_c[p, z] where A/B are windowed one-hot ("w") or windowed
# coordinate-ramp ("r = (p_y − y)·w") factors built in VMEM:
#
#   n: w·w   sx: (x_rel·w)·w   sy: r_y·w   sz: w·r_z
#   xx: (x²·w)·w  xy: (x·r_y)·w  xz: (x·w)·r_z  yy: r²_y·w  yz: r_y·r_z
#   zz: w·r²_z    hit: exact one-hots gated on the slice
#   minh: exact one-hots × (first-of-voxel-run flag · sub-voxel z)
#
# Points sorted by full linear voxel id with sub-voxel z as the secondary
# sort key, so each voxel run's FIRST point carries the voxel's minimum z
# (the reference's atomic.min at gvom.py:1329). Gating the minh channel on
# a first-of-run flag makes its "sum" have exactly one nonzero term per
# voxel = the min — an extra matmul instead of a 5 ms scatter-min; its value
# factor is bf16x3-decomposed so the compiled kernel is bitwise exact.
# Coordinate factors are O(1) in the target-local frame (the same
# conditioning trick the reference uses at gvom.py:1205-1207); their matmul
# precision is the GVOM_MOM_PRECISION knob (on-chip, default-precision f32
# dots are a single bf16 pass — see the knob's comment).
#
# The ±r_x X-NEIGHBORHOOD IS NOT IN THE KERNEL: each x-slice's matmuls run
# over exactly that slice's points (K = points-in-slice, not the 3× window),
# with x-moments taken about the SOURCE slice. The x-box then lands as a
# shift+translate post-pass over the packed output (moments.translate_raw's
# parallel-axis identity specialized to the packed slot layout in
# _xbox_translate_packed) — one fused elementwise XLA pass over ~200 MB
# instead of (2r_x+1)× the matmul FLOPs.

_PCHUNK = _env_chunk("GVOM_MOM_CHUNK", "1024")


def _env_int(name: str, default: str, lo: int, hi: int) -> int:
    raw = os.environ.get(name, default)
    try:
        v = int(raw)
    except ValueError:
        raise ValueError(f"{name}={raw!r}: must be an integer in [{lo}, {hi}]")
    if not (lo <= v <= hi):
        raise ValueError(f"{name}={raw!r}: must be an integer in [{lo}, {hi}]")
    return v


_XBLOCK = _env_int("GVOM_MOM_XB", "2", 1, 8)
             # W: x-slices per grid instance AND per matmul block — the A side
             # is [K, W·U] with the slice selected per point row by the
             # mixed-radix key (see _moment_kernel_factory). Larger W shares
             # each streamed chunk row across more slices (less chunk-padding
             # waste, the kernel's real bound) at the price of W× wider
             # A-side VPU temporaries and out/accumulator VMEM.


_MOM_PRECISION = _env_choice("GVOM_MOM_PRECISION", "f32", ("f32", "split", "highest"))
                        # Matmul precision of the nine moment-channel dots
                        # (the minh channel is EXACT in every mode — see the
                        # bf16x3 decomposition at the r5 computation):
                        # "f32": default-precision f32 dot_generals. On real
                        #   TPU, Mosaic lowers these to a SINGLE bf16 pass —
                        #   operands round to 8 mantissa bits, ~2^-9 relative
                        #   error on the coordinate-moment channels (found by
                        #   `cli selftest` on-chip r3; interpret mode runs
                        #   true f32 and cannot see it). Those channels feed
                        #   only the debug eigen-features (PARITY.md K16), so
                        #   this stays the fast default.
                        # "split": hi/lo bf16 decomposition per inexact
                        #   operand, dropping the lo*lo term — ~2^-16
                        #   relative error; exact one-hot factors stay
                        #   single-pass. 19 bf16 matmuls vs 9.
                        # "highest": precision=HIGHEST on inexact dots
                        #   (Mosaic multi-pass, ~f32-true, ≲2^-22).

_NPACK = 6  # packed matmul results per x-slice (see _moment_slice):
            # slots 0..4 are the raw moment channels in the VoxelGrid.mom
            # layout (ops.moments pack_moments, zero junk halves — a slot's
            # halves may come from two matmuls with disjoint half-masked B
            # factors), slot 5 = minh | hit


_MOM_RADIX = 1 << 12  # mixed-radix stride of the fused (x-slice, y) one-hot
                      # keys; must exceed the padded window y extent


def _moment_kernel_factory(cfg: GvomConfig, U: int, V: int, ry: int, rz: int, W: int, Y: int, Z: int):
    """One instance owns W consecutive x-slices and runs ONE matmul ladder
    whose A side is [K, W·U]: column block w targets slice xbase+w. A point
    row self-selects its block through a mixed-radix key compare
    (key = ux·RADIX + uy_window vs per-column (x, y) targets), so the
    y-window one-hot costs the same ops as the plain per-slice one — and the
    worklist's chunk windows cover W slices' points at once, cutting the
    matmul rows streamed (the kernel's real bound) by ~W× of the per-slice
    chunk-padding waste. Rows outside the instance's slices mask themselves
    out through the key (wrong x ⇒ |Δkey| ≥ RADIX), so no first/count
    liveness test exists at all."""

    def kernel(meta_ref, org_ref, px_ref, py_ref, pz_ref, mh_ref, out_ref):
        xb = pl.program_id(0)
        xbase = xb * W
        # torus one-hot targets (built once per instance): column c holds the
        # voxel whose torus y index is c mod U in slice xbase + c//U; its
        # padded-window y coordinate is ((c mod U − o) mod Y) + ry. The z axis
        # is laid out as TWO factor halves (columns [0,Z) and [Z,2Z) address
        # the same voxels — the B matrices pack two z-factors side by side so
        # every matmul runs at N = 2Z with no dead columns); columns ≥ 2Z
        # never match (sentinel).
        oy = org_ref[0, 1]
        oz = org_ref[0, 2]
        ys0 = org_ref[0, 3]  # torus-y slab base (0 for full grid): column c
        # targets torus y = ys0 + c, so the SAME kernel serves full-grid
        # (U = Y) and slab (U = Ys) ingest — the sharded ingest's per-device
        # y-slab (parallel/sharding.py, SURVEY §2.3 item 2)
        col = jax.lax.broadcasted_iota(jnp.int32, (_PCHUNK, W * U), 1)
        ywin = (ys0 + col % U - oy) % Y + ry
        keyc = (xbase + col // U) * _MOM_RADIX + ywin
        ywin_f = ywin.astype(jnp.float32)
        zio_raw = jax.lax.broadcasted_iota(jnp.int32, (_PCHUNK, V), 1)
        zc = zio_raw % Z
        zio = jnp.where(zio_raw < 2 * Z, (zc - oz) % Z + rz, jnp.int32(1 << 14))
        fid1 = (zio_raw >= Z) & (zio_raw < 2 * Z)      # second factor half
        zio_f = zio.astype(jnp.float32)

        abase = meta_ref[xb, 0]
        nchunks = meta_ref[xb, 1]
        count = meta_ref[xb, 2]
        npad = px_ref.shape[0]

        for w in range(W):
            for i in range(_NPACK):
                out_ref[w, i] = jnp.zeros((U, V), jnp.float32)

        @pl.when(count > 0)
        def _():
            def body(c, accs):
                base = pl.multiple_of(
                    jnp.minimum(abase + c * _PCHUNK, npad - _PCHUNK), _PCHUNK
                )
                px = px_ref[pl.ds(base, _PCHUNK)]
                py = py_ref[pl.ds(base, _PCHUNK)]
                pz = pz_ref[pl.ds(base, _PCHUNK)]
                ux = jnp.floor(px).astype(jnp.int32)
                uy = jnp.floor(py).astype(jnp.int32)
                uz = jnp.floor(pz).astype(jnp.int32)
                keyp = ux * _MOM_RADIX + uy            # [K]; dead points'
                # sentinel coords make the key negative ⇒ never matches
                xr = px - ux.astype(jnp.float32)       # exact own-slice offset

                dz = pz[:, None] - zio_f
                wzv = (jnp.abs(uz[:, None] - zio) <= rz).astype(jnp.float32)
                hitz = (uz[:, None] == zio).astype(jnp.float32)
                # packed B factors (lo half | hi half):
                #   B1 = [wz | rampz], BLO = [wz | 0], BHI = [0 | wz],
                #   B2H = [0 | ramp2z], BM = [hitz | 0], BH = [0 | hitz]
                b1 = jnp.where(fid1, dz * wzv, wzv)
                b_lo = jnp.where(fid1, 0.0, wzv)
                b_hi = wzv - b_lo
                b2h = jnp.where(fid1, dz * dz * wzv, 0.0)
                bm = jnp.where(fid1, 0.0, hitz)
                bh = hitz - bm
                kd = keyp[:, None] - keyc
                wy = (jnp.abs(kd) <= ry).astype(jnp.float32)   # same slice ∧ |Δy| ≤ ry
                dy = py[:, None] - ywin_f

                def mm(a, b):
                    return jax.lax.dot_general(
                        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                    )

                if _MOM_PRECISION == "split":
                    bf = jnp.bfloat16

                    def sp(a):
                        hi = a.astype(bf)
                        return hi, (a - hi.astype(jnp.float32)).astype(bf)

                    def mm_ee(a, b):      # both operands exact in bf16
                        return mm(a.astype(bf), b.astype(bf))

                    def mm_ie(a, b):      # a inexact, b exact (0/1)
                        ah, al = sp(a)
                        be = b.astype(bf)
                        return mm(ah, be) + mm(al, be)

                    def mm_ei(a, b):      # a exact (0/1), b inexact
                        bh_, bl_ = sp(b)
                        ae = a.astype(bf)
                        return mm(ae, bh_) + mm(ae, bl_)

                    def mm_ii(a, b):      # both inexact: drop lo*lo (~2^-16)
                        ah, al = sp(a)
                        bh_, bl_ = sp(b)
                        return mm(ah, bh_) + mm(al, bh_) + mm(ah, bl_)
                elif _MOM_PRECISION == "highest":
                    def mm_hi(a, b):
                        return jax.lax.dot_general(
                            a, b, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )

                    mm_ee = mm        # 0/1 operands are exact in one pass
                    mm_ie = mm_ei = mm_ii = mm_hi
                else:
                    mm_ee = mm_ie = mm_ei = mm_ii = mm

                # A-side matrices are built immediately before their matmuls so
                # only ~2 of the [CHUNK, W·U] f32 temporaries are live at a time
                # (VMEM budget; see the scoped-vmem OOM note in git history)
                r0 = mm_ei(wy, b1)                    # n | sz
                r4 = mm_ei(wy, b2h)                   # _ | zz
                xw = xr[:, None] * wy
                r1 = mm_ii(xw, b1)                    # sx | xz
                x2w = xr[:, None] * xw
                r3 = mm_ie(x2w, b_lo)                 # xx | _
                rampy = dy * wy
                r2 = mm_ii(rampy, b1)                 # sy | yz
                xry = xr[:, None] * rampy
                r3 = r3 + mm_ie(xry, b_hi)            # xx | xy
                ramp2y = dy * rampy
                r4 = r4 + mm_ie(ramp2y, b_lo)         # yy | zz
                hity = (kd == 0).astype(jnp.float32)  # exact (slice, y) match
                mh = mh_ref[pl.ds(base, _PCHUNK)]     # first-of-run flag · fz
                # minh must be EXACT in every mode — it feeds the height map
                # (Mosaic's default-precision f32 dots round operands to
                # bf16). Decompose mh into three bf16 terms (8+8+8 ≥ 24
                # mantissa bits; each residual is exactly representable, so
                # m1+m2+m3 == mh bitwise), multiply each by the exact 0/1
                # one-hot (bf16 product of a bf16 value and 0/1 is exact),
                # and accumulate — exactly one nonzero term lands per output
                # column (first-of-run gating), so no add ever rounds.
                bfl = jnp.bfloat16
                bm_b = bm.astype(bfl)
                # decompose in f32 (Mosaic can't minor-dim-expand bf16
                # vectors); every term is bf16-representable so the casts
                # after the 0/1 broadcast-multiply are exact
                m1 = mh.astype(bfl).astype(jnp.float32)
                rr = mh - m1
                m2 = rr.astype(bfl).astype(jnp.float32)
                m3 = rr - m2
                r5 = (
                    mm((m1[:, None] * hity).astype(bfl), bm_b)
                    + mm((m2[:, None] * hity).astype(bfl), bm_b)
                    + mm((m3[:, None] * hity).astype(bfl), bm_b)
                    + mm(hity.astype(bfl), bh.astype(bfl))
                )                                     # minh | hit
                # VoxelGrid.mom slot order: n|sz, sx|xz, sy|yz, xx|xy, yy|zz
                prods = (r0, r1, r2, r3, r4, r5)
                return tuple(a + p for a, p in zip(accs, prods))

            init = tuple(jnp.zeros((W * U, V), jnp.float32) for _ in range(_NPACK))
            accs = jax.lax.fori_loop(0, nchunks, body, init)
            for w in range(W):
                for i in range(_NPACK):
                    out_ref[w, i] = accs[i][w * U : (w + 1) * U, :]

    return kernel


def _xbox_translate_packed(out: jnp.ndarray, rx: int, Z: int, X: int):
    """Box-aggregate the per-slice exact moments over the ±rx x-neighborhood
    AND crop the x padding, in one pass. Returns (mom [X, 5, U, V],
    rM [X, U, V]) — cropping inside the translate keeps every shifted term a
    plain static slice of `out` (offsets rx+d ∈ [0, 2rx] are always in
    bounds), so XLA fuses the whole post-pass into one output-sized write
    instead of materializing the padded accumulator and copying a crop of it
    (the crop alone measured 0.5 ms/step at the reference config).

    `out` is the kernel's [Xp_pad, _NPACK, U, V] packed per-slice output with
    x-moments about the SOURCE slice. Target slice x receives source slice
    x+d (d ∈ [−rx, rx]) with coordinates translated by +d along x
    (moments.translate_raw, t=d), specialized to the packed slot halves:

      slot0 (n |sz): unchanged          slot2 (sy|yz): unchanged
      slot1 (sx|xz): += d·slot0         slot4 (yy|zz): unchanged
      slot3 (xx|xy): lo += 2d·slot1ᴸ + d²·slot0ᴸ ; hi += d·slot2ᴸ
      slot5 (minh|hit): endpoint-only — NOT box-aggregated (d=0 term only).
    """

    def sl(i: int, d: int) -> jnp.ndarray:
        # cropped target slice x reads padded source slice x + rx + d
        return out[rx + d : rx + d + X, i]

    acc = [sl(i, 0) for i in range(5)]
    V = out.shape[-1]
    pad = V - 2 * Z
    for d in range(-rx, rx + 1):
        if d == 0:
            continue
        t0, t1, t2, t3, t4 = (sl(i, d) for i in range(5))
        df = float(d)
        acc[0] = acc[0] + t0
        acc[1] = acc[1] + t1 + df * t0
        acc[2] = acc[2] + t2
        add3 = [2.0 * df * t1[..., :Z] + (df * df) * t0[..., :Z], df * t2[..., :Z]]
        if pad:
            add3.append(jnp.zeros(t0.shape[:-1] + (pad,), t0.dtype))
        acc[3] = acc[3] + t3 + jnp.concatenate(add3, axis=-1)
        acc[4] = acc[4] + t4
    return jnp.stack(acc, axis=1), sl(5, 0)


def _xbox_epilogue_factory(rx: int, Z: int, W: int, U: int, V: int,
                           occupancy_mask: bool = True):
    """Pallas epilogue: one HBM read of the moments kernel's padded per-slice
    output → (mom, hit, minh), with the ±rx x-box translate computed in VMEM.

    The same math as _xbox_translate_packed, but XLA lowers that form to a
    chain of full-size loop fusions (each re-reading ~200 MB — measured
    2.05 ms/step at the reference config) because the d-shifted reads defeat
    its producer fusion. Here each grid instance DMAs its W output slices
    plus the 2·rx halo slices into VMEM once and streams the translate on the
    VPU: total HBM traffic = one read of the kernel output + one write of the
    final arrays (~0.42 GB ≈ 0.5 ms floor).

    Outputs are WINDOW layout (x-cropped, unrolled); the caller's torus roll
    stays in XLA where it fuses into the buffer-insert's update."""
    pad = V - 2 * Z
    H = W + 2 * rx

    def kernel(out_hbm, mom_ref, hit_ref, minh_ref, scratch, sems):
        # Double-buffered manual DMA: overlapping H=W+2rx windows can't be
        # expressed as BlockSpecs (index maps stride by the block size), and
        # the r3 serial start/wait form ran at ~2x its traffic floor with no
        # overlap. Instance xb kicks off window xb+1's copy before waiting on
        # its own, so the DMA of the next window rides under this window's
        # VPU translate.
        xb = pl.program_id(0)
        n = pl.num_programs(0)

        @pl.when(xb == 0)
        def _():
            pltpu.make_async_copy(
                out_hbm.at[pl.ds(0, H)], scratch.at[0], sems.at[0]
            ).start()

        @pl.when(xb + 1 < n)
        def _():
            pltpu.make_async_copy(
                out_hbm.at[pl.ds((xb + 1) * W, H)],
                scratch.at[(xb + 1) % 2],
                sems.at[(xb + 1) % 2],
            ).start()

        pltpu.make_async_copy(
            out_hbm.at[pl.ds(xb * W, H)], scratch.at[xb % 2], sems.at[xb % 2]
        ).wait()
        cur = scratch.at[xb % 2]

        def src(r):
            return cur[r]

        for w in range(W):
            base = src(w + rx)                # [6, U, V]
            acc = [base[i] for i in range(5)]
            for d in range(-rx, rx + 1):
                if d == 0:
                    continue
                t = src(w + rx + d)
                df = float(d)
                t0, t1, t2 = t[0], t[1], t[2]
                acc[0] = acc[0] + t0
                acc[1] = acc[1] + t1 + df * t0
                acc[2] = acc[2] + t2
                parts = [2.0 * df * t1[:, :Z] + (df * df) * t0[:, :Z],
                         df * t2[:, :Z]]
                if pad:
                    parts.append(jnp.zeros((U, pad), jnp.float32))
                acc[3] = acc[3] + t[3] + jnp.concatenate(parts, axis=1)
                acc[4] = acc[4] + t[4]
            rM = src(w + rx)[5]
            hitf = rM[:, Z: 2 * Z]            # counts are exact in f32
            # occupancy pre-mask (r5): moments are stored zero at unoccupied
            # voxels — every consumer (combine slot fusion, batched merge,
            # exporters) only reads them under (hit > 0) anyway, and masking
            # HERE (a lane concat of the hit mask the kernel already has)
            # lets the combine's slot mom merges use pure axis-alignment
            # masks instead of data-dependent interleaved masks.
            if occupancy_mask:
                om = (hitf > 0.0).astype(jnp.float32)
                parts = [om, om]
                if pad:
                    parts.append(jnp.zeros((U, pad), jnp.float32))
                omm = jnp.concatenate(parts, axis=1)
                for i in range(5):
                    mom_ref[w, i] = acc[i] * omm
            else:
                for i in range(5):
                    mom_ref[w, i] = acc[i]
            hit_ref[w] = hitf.astype(jnp.int32)
            minh_ref[w] = jnp.where(hitf > 0.0, rM[:, :Z], 1.0)

    return kernel


def _xbox_epilogue(out: jnp.ndarray, rx: int, Z: int, X: int, interpret: bool = False,
                   occupancy_mask: bool = True):
    """(mom [X,5,U,V], hit [X,U,Z] i32, minh [X,U,Z]) — window layout."""
    U, V = out.shape[2], out.shape[3]
    W = 16
    while X % W:
        W //= 2

    def vmem_bytes(w):
        # double-buffered halo scratch + pallas' double-buffered out blocks
        scratch = 2 * (w + 2 * rx) * 6 * U * V * 4
        outs = 2 * (w * 5 * U * V + 2 * w * U * Z) * 4
        return scratch + outs

    # large grids (512²: U = 512) blow the 100 MB scoped window at W = 16 —
    # halve the block until the estimate fits with headroom
    while W > 2 and vmem_bytes(W) > 80 * 1024 * 1024:
        W //= 2
    if W < 2 * rx:
        # the lookahead-block halo needs 2rx ≤ W; huge eigen radii fall back
        # to the (slower, exact) XLA translate
        mom, rM = _xbox_translate_packed(out, rx, Z, X)
        hit = rM[..., Z: 2 * Z].astype(jnp.int32)
        if occupancy_mask:
            from gvom_tpu.ops.moments import packed_voxel_mask

            mom = jnp.where(packed_voxel_mask(hit > 0, Z)[:, None], mom, 0.0)
        return mom, hit, jnp.where(hit > 0, rM[..., :Z], 1.0)
    n_inst = X // W
    return pl.pallas_call(
        _xbox_epilogue_factory(rx, Z, W, U, V, occupancy_mask),
        grid=(n_inst,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((W, 5, U, V), lambda xb: (xb, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, U, Z), lambda xb: (xb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, U, Z), lambda xb: (xb, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((X, 5, U, V), jnp.float32),
            jax.ShapeDtypeStruct((X, U, Z), jnp.int32),
            jax.ShapeDtypeStruct((X, U, Z), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, W + 2 * rx, 6, U, V), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(out)


def _xbox_epilogue_into_factory(rx: int, Z: int, W: int, U: int, V: int, X: int,
                                occupancy_mask: bool = True):
    """Slot-direct variant of the x-box epilogue (VERDICT r4 ask #5): the mom
    channel is written IN PLACE into the ring buffer's stacked mom array at
    [slot, (x + rollx) mod X] — pre-rolled to torus x — via per-row manual
    DMA against an aliased HBM output. This removes BOTH the XLA-side mom
    roll (~0.18 ms/scan) and the full-buffer mom rebuild fusion the
    dynamic-update insert otherwise materializes (~0.51 ms/scan traced).
    hit/minh stay pipelined block outputs in window layout."""
    pad = V - 2 * Z
    H = W + 2 * rx

    def kernel(s_ref, out_hbm, bufmom_in, bufmom, hit_ref, minh_ref,
               scratch, momrow, sems, osems):
        del bufmom_in  # aliased to bufmom; never read
        xb = pl.program_id(0)
        n = pl.num_programs(0)
        slot = s_ref[0]
        rollx = s_ref[1]

        @pl.when(xb == 0)
        def _():
            pltpu.make_async_copy(
                out_hbm.at[pl.ds(0, H)], scratch.at[0], sems.at[0]
            ).start()

        @pl.when(xb + 1 < n)
        def _():
            pltpu.make_async_copy(
                out_hbm.at[pl.ds((xb + 1) * W, H)],
                scratch.at[(xb + 1) % 2],
                sems.at[(xb + 1) % 2],
            ).start()

        pltpu.make_async_copy(
            out_hbm.at[pl.ds(xb * W, H)], scratch.at[xb % 2], sems.at[xb % 2]
        ).wait()
        cur = scratch.at[xb % 2]

        def src(r):
            return cur[r]

        for w in range(W):
            base = src(w + rx)                # [6, U, V]
            acc = [base[i] for i in range(5)]
            for d in range(-rx, rx + 1):
                if d == 0:
                    continue
                t = src(w + rx + d)
                df = float(d)
                t0, t1, t2 = t[0], t[1], t[2]
                acc[0] = acc[0] + t0
                acc[1] = acc[1] + t1 + df * t0
                acc[2] = acc[2] + t2
                parts = [2.0 * df * t1[:, :Z] + (df * df) * t0[:, :Z],
                         df * t2[:, :Z]]
                if pad:
                    parts.append(jnp.zeros((U, pad), jnp.float32))
                acc[3] = acc[3] + t[3] + jnp.concatenate(parts, axis=1)
                acc[4] = acc[4] + t[4]
            rM = src(w + rx)[5]
            hitf = rM[:, Z: 2 * Z]            # counts are exact in f32
            if occupancy_mask:
                om = (hitf > 0.0).astype(jnp.float32)
                parts = [om, om]
                if pad:
                    parts.append(jnp.zeros((U, pad), jnp.float32))
                omm = jnp.concatenate(parts, axis=1)
            bslot = w % 2
            if w >= 2:
                # reusing the double-buffered row: its previous DMA must land
                prow = (xb * W + (w - 2) + rollx) % X
                pltpu.make_async_copy(
                    momrow.at[bslot], bufmom.at[slot, prow], osems.at[bslot]
                ).wait()
            for i in range(5):
                momrow[bslot, i] = (acc[i] * omm) if occupancy_mask else acc[i]
            row = (xb * W + w + rollx) % X
            pltpu.make_async_copy(
                momrow.at[bslot], bufmom.at[slot, row], osems.at[bslot]
            ).start()
            hit_ref[w] = hitf.astype(jnp.int32)
            minh_ref[w] = jnp.where(hitf > 0.0, rM[:, :Z], 1.0)
        # drain the last two row DMAs before the instance retires
        last_row = (xb * W + W - 1 + rollx) % X
        pltpu.make_async_copy(
            momrow.at[(W - 1) % 2], bufmom.at[slot, last_row], osems.at[(W - 1) % 2]
        ).wait()
        if W >= 2:
            prev_row = (xb * W + W - 2 + rollx) % X
            pltpu.make_async_copy(
                momrow.at[(W - 2) % 2], bufmom.at[slot, prev_row], osems.at[(W - 2) % 2]
            ).wait()

    return kernel


def _xbox_epilogue_into(out, rx: int, Z: int, X: int, buf_mom, slot, rollx,
                        occupancy_mask: bool = True):
    """(new_buf_mom, hit [X,U,Z] i32 window, minh [X,U,Z] f32 window) — the
    mom channel lands pre-rolled in buf_mom[slot]; see the factory note."""
    U, V = out.shape[2], out.shape[3]
    W = 16
    while X % W:
        W //= 2

    def vmem_bytes(w):
        scratch = 2 * (w + 2 * rx) * 6 * U * V * 4
        momrow = 2 * 5 * U * V * 4
        outs = 2 * (2 * w * U * Z) * 4
        return scratch + momrow + outs

    while W > 2 and vmem_bytes(W) > 80 * 1024 * 1024:
        W //= 2
    if W < 2 * rx:
        raise ValueError("x-box radius too large for the slot-direct epilogue")
    n_inst = X // W
    scal = jnp.stack([slot.astype(jnp.int32), rollx.astype(jnp.int32)])
    new_buf, hit, minh = pl.pallas_call(
        _xbox_epilogue_into_factory(rx, Z, W, U, V, X, occupancy_mask),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_inst,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((W, U, Z), lambda xb, s: (xb, 0, 0)),
                pl.BlockSpec((W, U, Z), lambda xb, s: (xb, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, W + 2 * rx, 6, U, V), jnp.float32),
                pltpu.VMEM((2, 5, U, V), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct(buf_mom.shape, buf_mom.dtype),
            jax.ShapeDtypeStruct((X, U, Z), jnp.int32),
            jax.ShapeDtypeStruct((X, U, Z), jnp.float32),
        ),
        input_output_aliases={2: 0},   # buf_mom (after the scalar operand) → out 0
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(scal, out, buf_mom)
    return new_buf, hit, minh


def fused_point_moments(
    cfg: GvomConfig,
    points: jnp.ndarray,
    keep: jnp.ndarray,
    origin: jnp.ndarray,
    interpret: bool = False,
    y_window=None,
    occupancy_mask: bool = True,
    mom_into=None,
):
    """Returns (hit [X,Y,Z] i32, min_height [X,Y,Z] f32, mom [X,5,Y,Vp] f32) —
    endpoint counts, per-voxel min sub-voxel z, and raw target-voxel-local
    moment sums in the packed VoxelGrid.mom layout (ops.moments), matching
    binning.bin_points + moments.box_aggregate_moments + pack_moments.

    y_window = (ys0, Ys): compute only the torus y-slab [ys0, ys0+Ys) —
    outputs shrink to [X, Ys, Z] / [X, 5, Ys, Vp] and, because points whose
    ±ry neighborhood misses the slab are masked dead BEFORE the voxel sort,
    the matmul rows streamed (the kernel's bound) scale with the slab's
    point share ≈ 1/n_space. Matches binning.slab_point_moments."""
    from gvom_tpu.ops import grid as gridops
    from gvom_tpu.ops.binning import moment_pad

    X, Y, Z = cfg.grid_shape
    rx, ry, rz = moment_pad(cfg)
    if Z + 2 * rz >= (1 << 14):
        raise ValueError("z_size too large for the kernel's pad-column sentinel")
    Xp = X + 2 * rx
    from gvom_tpu.ops.moments import packed_lanes

    ys0, Ys = (0, Y) if y_window is None else y_window
    U = Ys                                  # torus y columns (exact)
    V = packed_lanes(Z)                     # TWO packed z-factor halves + padding
    res = gridops.resolution_vector(cfg)
    pn = points / res - origin.astype(jnp.float32)
    pad_off = jnp.array([rx, ry, rz], jnp.float32)
    pp = pn + pad_off[None, :]
    Yp = Y + 2 * ry
    Zp = Z + 2 * rz
    ux = jnp.floor(pp[:, 0]).astype(jnp.int32)
    uy = jnp.floor(pp[:, 1]).astype(jnp.int32)
    uz = jnp.floor(pp[:, 2]).astype(jnp.int32)
    # points fully outside the padded grid (any axis) are dead
    inb = (
        keep
        & (pp[:, 0] >= 0) & (pp[:, 0] < Xp)
        & (pp[:, 1] >= 0) & (pp[:, 1] < Yp)
        & (pp[:, 2] >= 0) & (pp[:, 2] < Zp)
    )
    if y_window is not None:
        # slab prefilter: a point reaches slab columns iff some torus y in
        # [ty − ry, ty + ry] lies in [ys0, ys0+Ys). Dead points sort to the
        # end, so per-x-slice chunk counts (the rows streamed) shrink to the
        # slab's point share.
        ty = jnp.mod(uy - ry + origin[1], Y)           # torus y of the endpoint voxel
        d = jnp.mod(ty - ys0, Y)
        inb = inb & ((d < Ys + ry) | (d >= Y - ry))
    vid_dead = Xp * Yp * Zp
    vid = jnp.where(inb, (ux * Yp + uy) * Zp + uz, vid_dead)
    big = jnp.float32(3 * max(Xp, Yp, Zp))
    px = jnp.where(inb, pp[:, 0], -big)
    py = jnp.where(inb, pp[:, 1], -big)
    pz = jnp.where(inb, pp[:, 2], -big)
    # secondary key: sub-voxel z as order-preserving int bits (fz ≥ 0), so
    # each voxel run's first point carries min(fz) — see kernel header.
    # fz comes from the UNPADDED map-local coordinate: pn_z − floor(pn_z) is
    # exact in f32 (same expression as binning.bin_points's `local`), whereas
    # the padded pp_z = pn_z + rz rounds when the add crosses a binade (ulp
    # 2⁻¹⁸ at z≈64 — the on-chip selftest caught exactly that delta)
    fz = pn[:, 2] - jnp.floor(pn[:, 2])
    fzbits = jax.lax.bitcast_convert_type(fz, jnp.int32)
    vid_s, _, px_s, py_s, pz_s, fz_s = jax.lax.sort(
        (vid, fzbits, px, py, pz, fz), num_keys=2
    )
    first = jnp.concatenate([jnp.ones((1,), bool), vid_s[1:] != vid_s[:-1]])
    mhval = jnp.where(first & (vid_s < vid_dead), fz_s, 0.0)

    n = points.shape[0]
    npad = ((n + _PCHUNK - 1) // _PCHUNK + 1) * _PCHUNK
    padn = npad - n
    px_s = jnp.pad(px_s, (0, padn), constant_values=-big)
    py_s = jnp.pad(py_s, (0, padn), constant_values=-big)
    pz_s = jnp.pad(pz_s, (0, padn), constant_values=-big)
    mhval = jnp.pad(mhval, (0, padn))

    # per-x-voxel cumulative offsets -> per-INSTANCE chunk windows (an
    # instance covers W slices in one matmul ladder; the ±rx box is the
    # post-pass below, not a wider worklist window). vid_s is sorted, so
    # cum[x] = #(ux < x) is a binary search — r5: replaces the [N, Xp+1]
    # one-hot count matmul, whose operand grew with the batched
    # merged-points N (B=64 blew the 128 MB XLA vmem budget) and cost a
    # full N-row stream even at N = 131k
    key_s = vid_s // (Yp * Zp)                     # back to x-slice keys (sorted)
    cum = jnp.searchsorted(key_s, jnp.arange(Xp + 1, dtype=key_s.dtype),
                           side="left").astype(jnp.int32)       # [Xp+1]

    W = _XBLOCK
    if Yp >= _MOM_RADIX:
        raise ValueError("padded y extent too large for the slice-key radix")
    Xp_pad = ((Xp + W - 1) // W) * W
    n_inst = Xp_pad // W
    xb = jnp.arange(n_inst)
    lo = cum[jnp.minimum(xb * W, Xp)]
    hi = cum[jnp.minimum((xb + 1) * W, Xp)]
    abase = (lo // _PCHUNK) * _PCHUNK
    nchunks = (hi - abase + _PCHUNK - 1) // _PCHUNK
    meta = jnp.stack([abase, nchunks, hi - lo], axis=1)   # [n_inst, 3]
    org = jnp.concatenate(
        [origin.astype(jnp.int32), jnp.asarray(ys0, jnp.int32)[None]]
    )[None, :]
    out = pl.pallas_call(
        _moment_kernel_factory(cfg, U, V, ry, rz, W, Y, Z),
        grid=(n_inst,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, _NPACK, U, V), lambda xb: (xb, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Xp_pad, _NPACK, U, V), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(meta, org, px_s, py_s, pz_s, mhval)

    if mom_into is not None:
        # slot-direct insert (r5): the epilogue writes the mom channel
        # straight into the ring buffer's stacked array, pre-rolled to torus
        # x — no XLA mom roll and no full-buffer rebuild fusion. Returns
        # (hit, minh, NEW buffer mom). Single-scan ingest only.
        assert y_window is None, "mom_into is the per-scan insert path"
        buf_mom, slot = mom_into
        rollx = origin[0] % X
        if not interpret:
            new_buf, hit, minh = _xbox_epilogue_into(
                out, rx, Z, X, buf_mom, slot, rollx, occupancy_mask=occupancy_mask)
        else:
            mom, rM = _xbox_translate_packed(out, rx, Z, X)
            hit = rM[..., Z: 2 * Z].astype(jnp.int32)
            minh = jnp.where(hit > 0, rM[..., :Z], 1.0)
            if occupancy_mask:
                from gvom_tpu.ops.moments import packed_voxel_mask

                mom = jnp.where(packed_voxel_mask(hit > 0, Z)[:, None], mom, 0.0)
            new_buf = jax.lax.dynamic_update_index_in_dim(
                buf_mom, jnp.roll(mom, rollx, axis=0), slot, 0)
        hit = jnp.roll(hit, rollx, axis=0)
        minh = jnp.roll(minh, rollx, axis=0)
        return hit, minh, new_buf

    # x-box aggregation: shift+translate over the per-slice exact output,
    # with the x-padding crop fused into the same pass (slots 0..4; slot 5 is
    # endpoint-only and stays d=0). y/z columns are already torus.
    # Slots 0..4 ARE the packed VoxelGrid.mom layout — no lane-half splitting
    # (that repacking measured ~5 ms/step); only slot 5 (minh | hit) is split,
    # since the occupancy mask and height map need plain [X,Y,Z] channels.
    # The translate runs as a second pallas kernel (one HBM pass); the XLA
    # form is kept as the interpret-mode fallback and its exactness oracle.
    if not interpret:
        mom, hit, minh = _xbox_epilogue(out, rx, Z, X, occupancy_mask=occupancy_mask)
    else:
        mom, rM = _xbox_translate_packed(out, rx, Z, X)
        hit = rM[..., Z : 2 * Z].astype(jnp.int32)
        minh = jnp.where(hit > 0, rM[..., :Z], 1.0)  # empty: 1.0 (gvom.py:1014-1015)
        if occupancy_mask:
            from gvom_tpu.ops.moments import packed_voxel_mask

            mom = jnp.where(packed_voxel_mask(hit > 0, Z)[:, None], mom, 0.0)
    # raw sums need no normalization — move the x axis into torus layout
    # (leading-axis roll: contiguous) and return
    rollx = origin[0] % X
    hit = jnp.roll(hit, rollx, axis=0)
    minh = jnp.roll(minh, rollx, axis=0)
    mom = jnp.roll(mom, rollx, axis=0)
    return hit, minh, mom


# ======================================================================
# Fused combine ("mega-combine"): phase A + phase B + column products
# ======================================================================
#
# The XLA combine (models/pipeline.py) lowers to several full-grid loop
# fusions — the 5-source mom fusion alone re-reads ~1.18 GB and phase A's
# slot-order evidence latching re-reads the hit/miss channels the mom pass
# already streamed. This kernel is ONE HBM pass: each grid instance DMAs a
# W-slice block of all 4 buffer slots + the old world, computes phase A
# (occupancy + slot-order evidence latching + decay veto, gvom.py:941-997),
# phase B (occupied-source data fusion, gvom.py:198-266), AND the per-column
# 2D reductions (height / inferred height / positive-obstacle band,
# gvom.py:487-554) in VMEM, and writes each output once. Bitwise-identical
# accumulation order to the XLA path (slots 0..B-1 then old; one-hot column
# selects), pinned by tests/test_combine_kernel.py and `cli selftest`.

_CMB_XB = _env_int("GVOM_CMB_XB", "4", 1, 16)   # W: x-slices per instance


def _combine_kernel_factory(cfg: GvomConfig, B: int, W: int):
    X, Y, Z = cfg.grid_shape
    from gvom_tpu.ops.moments import packed_lanes

    R = Y // 2                         # packed y rows (y-paired channel storage)
    L = 2 * Z                          # packed lanes: [z of even y | z of odd y]
    UH = -1000.0                       # types.UNKNOWN_HEIGHT (import cycle)
    zres = float(cfg.z_resolution)
    xyres = float(cfg.xy_resolution)
    decay = int(cfg.decay_miss_limit)
    pot = float(cfg.positive_obstacle_threshold)
    rh = float(cfg.robot_height)
    hct = int(cfg.hit_count_threshold)
    # f32 round-trip before squaring so the ego-disk constant matches the
    # XLA path's jnp.float32(robot_radius) ** 2 bit-for-bit (advertised
    # bitwise identity; a f64 square can round to the other side of a cell)
    import numpy as _np
    rr2 = float(_np.float32(cfg.robot_radius) * _np.float32(cfg.robot_radius))
    g2l = float(cfg.ground_to_lidar_height)

    def kernel(org_ref, iscal_ref, ego_ref,
               bhit_ref, bmiss_ref, bminh_ref,
               ohit_ref, omiss_ref, ominh_ref, oev_ref,
               hit_o, miss_o, minh_o, ev_o,
               hm_o, ihm_o, pnum_o, pden_o, bok_o):
        """org_ref (SMEM): [B+2, 3] i32 — slot origins, old origin, target.
        iscal_ref (SMEM): [B+2] i32 — slot_valid ×B, old_valid, any_valid.
        ego_ref (SMEM): [3] f32.

        All scalar-channel refs are in the y-paired packed layout [.., R, L]
        (ops/grid) — FULL 128-lane tiles at Z = 64, which is what makes this
        kernel's VPU work and VMEM footprint match its logical size (the r4
        form ran at half lane utilization and lost to XLA on padding alone).
        Per-column (2D) outputs are written column-planar [W, R, 2] (lane 0 =
        even y, lane 1 = odd y); the caller reshapes to [X, Y] in XLA.

        The mom channel is NOT merged here (r5 split): XLA's masked-add mom
        fusion already runs at HBM speed of light (~1.4 ms traced), while
        carrying mom through this kernel dragged the whole pass to ~4 ms
        (mom is 13 of 21.5 MB per instance, plus a per-slice occ2 relayout
        in the mom orientation). The caller merges mom in XLA from this
        kernel's hit output (hit > 0 ⇔ occ2 exactly — phase B writes a
        positive hit at every occupied cell)."""
        xb = pl.program_id(0)
        ot0, ot1, ot2 = org_ref[B + 1, 0], org_ref[B + 1, 1], org_ref[B + 1, 2]
        anyv = iscal_ref[B + 1] > 0
        rio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
        lio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        half = (lio >= Z).astype(jnp.int32)
        ypk = 2 * rio + half               # logical y per packed position
        zpk = lio - half * Z               # logical z per packed position
        pz = (zpk - ot2) % Z               # window-relative z priority
        rio1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

        def axis_ok(coords, o_t, o_s, size):
            rel_t = (coords - o_t) % size
            d = o_t - o_s
            return (rel_t >= -jnp.minimum(d, 0)) & (rel_t < size - jnp.maximum(d, 0))


        def halves_cat(lo1, hi1, w_lanes):
            # [R,1] per-half column values → [R, 2·w_lanes] broadcast form
            a = jnp.broadcast_to(lo1, (R, w_lanes))
            b = jnp.broadcast_to(hi1, (R, w_lanes))
            return jnp.concatenate([a, b], axis=1)

        # w-invariant per-slot mask factors, hoisted out of the slice loop
        # (they depend only on origins). Only the scalar x factor is per-w.
        yz_pk = [axis_ok(ypk, ot1, org_ref[s, 1], X)
                 & axis_ok(zpk, ot2, org_ref[s, 2], Z) for s in range(B + 1)]

        for w in range(W):
            xg = xb * W + w
            # ---- phase A: occupancy + slot-order evidence latching ----
            occ = jnp.zeros((R, L), jnp.bool_)
            ev = jnp.zeros((R, L), jnp.int32)
            smask = []
            for s in range(B):
                okx = axis_ok(xg, ot0, org_ref[s, 0], X) & (iscal_ref[s] > 0)
                am = yz_pk[s] & okx
                h = bhit_ref[s, w]
                s_occ = (h > 0) & am
                s_ev = jnp.where(am & ~s_occ, bmiss_ref[s, w], 0)
                ev = jnp.where((s_ev > 0) & ~occ, ev + s_ev, ev)
                occ = occ | s_occ
                smask.append(s_occ)
            okx = axis_ok(xg, ot0, org_ref[B, 0], X) & (iscal_ref[B] > 0)
            oam = yz_pk[B] & okx
            old_h = ohit_ref[w]
            old_occ = (old_h > 0) & oam
            revive = old_occ & ~occ & (ev <= decay)     # staleness veto (gvom.py:992)
            occ2 = occ | revive
            old_ev = jnp.where(oam, oev_ref[w], 0)
            ev = jnp.where(~old_occ & (old_ev > 0) & ~occ2, ev + old_ev, ev)
            ev = jnp.where(occ2, 0, ev)                 # occupied-wins (gvom.py:947-950)

            # ---- phase B: occupied-source data fusion ----
            hit = jnp.zeros((R, L), jnp.int32)
            miss = jnp.zeros((R, L), jnp.int32)
            mh = jnp.ones((R, L), jnp.float32)
            for s in range(B):
                m = smask[s]
                hit = hit + jnp.where(m, bhit_ref[s, w], 0)
                miss = miss + jnp.where(m, bmiss_ref[s, w], 0)
                mh = jnp.where(m, jnp.minimum(mh, bminh_ref[s, w]), mh)
            mold = old_occ & occ2
            hit = hit + jnp.where(mold, old_h, 0)
            miss = miss + jnp.where(mold, omiss_ref[w], 0)
            mh = jnp.where(mold, jnp.minimum(mh, ominh_ref[w]), mh)

            # ---- world outputs (any_valid latch = pipeline._tree_where) ----
            hit_o[w] = jnp.where(anyv, hit, ohit_ref[w])
            miss_o[w] = jnp.where(anyv, miss, omiss_ref[w])
            minh_o[w] = jnp.where(anyv, mh, ominh_ref[w])
            ev_o[w] = jnp.where(anyv, ev, oev_ref[w])

            # ---- 2D column products (maps2d.height_map / inferred / pos),
            # computed per lane-half with keepdims reductions; outputs are
            # column-planar [R, 2] ----
            score = jnp.where(occ2, pz, Z)
            zrel_lo = jnp.min(score[:, :Z], axis=1, keepdims=True)   # [R,1]
            zrel_hi = jnp.min(score[:, Z:], axis=1, keepdims=True)
            zrel_b = halves_cat(zrel_lo, zrel_hi, Z)
            selc = occ2 & (score == zrel_b)
            mhsel = jnp.where(selc, mh, 0.0)
            mh_lo = jnp.sum(mhsel[:, :Z], axis=1, keepdims=True)
            mh_hi = jnp.sum(mhsel[:, Z:], axis=1, keepdims=True)
            mhsum = jnp.concatenate([mh_lo, mh_hi], axis=1)          # [R,2]
            zrel2d = jnp.concatenate([zrel_lo, zrel_hi], axis=1)
            any_hit = zrel2d < Z
            col_h = (mhsum + zrel2d.astype(jnp.float32)
                     + ot2.astype(jnp.float32)) * zres
            relx = ((xg - ot0) % X).astype(jnp.float32)
            ycol = 2 * rio1 + jnp.arange(2, dtype=jnp.int32)[None, :]  # [R,2]
            rely = ((ycol - ot1) % X).astype(jnp.float32)
            gx = (ot0.astype(jnp.float32) + relx) * xyres - ego_ref[0]
            gy = (ot1.astype(jnp.float32) + rely) * xyres - ego_ref[1]
            disk = gx * gx + gy * gy <= rr2
            seed = jnp.where(disk, ego_ref[2] - g2l, UH)
            hm = jnp.where(any_hit, col_h, seed)                     # [R,2]
            hm_o[w] = hm

            miss_col = (~occ2) & (ev > 0)
            score2 = jnp.where(miss_col, pz, Z)
            z2_lo = jnp.min(score2[:, :Z], axis=1, keepdims=True)
            z2_hi = jnp.min(score2[:, Z:], axis=1, keepdims=True)
            z2 = jnp.concatenate([z2_lo, z2_hi], axis=1)
            ihm_o[w] = jnp.where(
                z2 < Z,
                (z2.astype(jnp.float32) + ot2.astype(jnp.float32)) * zres,
                UH,
            )

            o2f = ot2.astype(jnp.float32)
            lo2 = jnp.floor((hm + pot) / zres - o2f).astype(jnp.int32) + 1    # [R,2]
            hi2 = jnp.floor((hm + rh) / zres - o2f).astype(jnp.int32)
            band_ok = (lo2 >= 0) & (lo2 < Z) & (hi2 >= 0) & (hi2 < Z)
            lo_b = halves_cat(lo2[:, 0:1], lo2[:, 1:2], Z)
            hi_b = halves_cat(hi2[:, 0:1], hi2[:, 1:2], Z)
            in_band = (pz >= lo_b) & (pz <= hi_b)
            strong = occ2 & (hit > hct)
            sel = in_band & strong
            nsel = jnp.where(sel, hit, 0)
            dsel = jnp.where(sel, hit + miss, 0)
            n_lo = jnp.sum(nsel[:, :Z], axis=1, keepdims=True)
            n_hi = jnp.sum(nsel[:, Z:], axis=1, keepdims=True)
            d_lo = jnp.sum(dsel[:, :Z], axis=1, keepdims=True)
            d_hi = jnp.sum(dsel[:, Z:], axis=1, keepdims=True)
            pnum_o[w] = jnp.concatenate([n_lo, n_hi], axis=1)
            pden_o[w] = jnp.concatenate([d_lo, d_hi], axis=1)
            bok_o[w] = band_ok.astype(jnp.int32)

    return kernel


def fused_combine(cfg: GvomConfig, buf, world, ego_position, origin,
                  interpret: bool = False):
    """One-HBM-pass combine of the SCALAR channels + 2D column products.
    Returns (hit_pk, miss_pk, minh_pk, evidence_pk, hm_t, ihm_t, pnum_t,
    pden_t, bok_t) — packed channels with the any_valid latch already
    applied, 2D maps in torus layout. Bitwise-identical to the XLA combine's
    phase A/B and to maps2d's column products.

    The mom channel is merged by the caller in XLA (pipeline._combine_fused)
    from hit_pk > 0 (≡ occ2) — see the kernel docstring for why."""
    B = cfg.buffer_size
    X, Y, Z = cfg.grid_shape
    R, L = Y // 2, 2 * Z
    W = _CMB_XB
    while X % W:
        W //= 2
    n_inst = X // W
    g = buf.grids
    org = jnp.concatenate(
        [g.origin[:B], world.grid.origin[None, :], origin[None, :]], axis=0
    ).astype(jnp.int32)                                     # [B+2, 3]
    any_valid = jnp.any(buf.slot_valid)
    iscal = jnp.concatenate(
        [buf.slot_valid.astype(jnp.int32),
         world.valid.astype(jnp.int32)[None],
         any_valid.astype(jnp.int32)[None]]
    )                                                        # [B+2]
    ego = ego_position.astype(jnp.float32)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    slot3 = pl.BlockSpec((B, W, R, L), lambda xb: (0, xb, 0, 0), memory_space=pltpu.VMEM)
    old3 = pl.BlockSpec((W, R, L), lambda xb: (xb, 0, 0), memory_space=pltpu.VMEM)
    # 2D outputs are column-planar [X, R, 2] (lane 0/1 = even/odd y);
    # reshaped to the torus [X, Y] maps in XLA below (contiguous)
    out2d = pl.BlockSpec((W, R, 2), lambda xb: (xb, 0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _combine_kernel_factory(cfg, B, W),
        grid=(n_inst,),
        in_specs=[smem, smem, smem,
                  slot3, slot3, slot3,
                  old3, old3, old3, old3],
        out_specs=(old3, old3, old3, old3, out2d, out2d, out2d, out2d, out2d),
        out_shape=(
            jax.ShapeDtypeStruct((X, R, L), jnp.int32),
            jax.ShapeDtypeStruct((X, R, L), jnp.int32),
            jax.ShapeDtypeStruct((X, R, L), jnp.float32),
            jax.ShapeDtypeStruct((X, R, L), jnp.int32),
            jax.ShapeDtypeStruct((X, R, 2), jnp.float32),
            jax.ShapeDtypeStruct((X, R, 2), jnp.float32),
            jax.ShapeDtypeStruct((X, R, 2), jnp.int32),
            jax.ShapeDtypeStruct((X, R, 2), jnp.int32),
            jax.ShapeDtypeStruct((X, R, 2), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(org, iscal, ego,
      g.hit_pk, g.miss_pk, g.minh_pk,
      world.grid.hit_pk, world.grid.miss_pk, world.grid.minh_pk,
      world.evidence_pk)
    hit, miss, minh, ev, hm_t, ihm_t, pnum, pden, bok = outs
    hm_t, ihm_t, pnum, pden, bok = (a.reshape(X, Y) for a in (hm_t, ihm_t, pnum, pden, bok))
    return hit, miss, minh, ev, hm_t, ihm_t, pnum, pden, bok
