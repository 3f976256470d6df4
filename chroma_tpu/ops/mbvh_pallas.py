"""Pallas (Mosaic) walker body: the MBVH traversal iteration as ONE
fused TPU kernel.

Why: the de-noised round-3 profile (ARCHITECTURE.md) shows the jnp
walker body costs 90-103 ns/lane-iteration while its only HBM-resident
work — the 3.4 KB row gather — costs ~8 ns.  The rest is XLA
materializing (n,128) intermediates between partial fusions.  This
module keeps the row fetch in XLA (its gather hits ~528 GB/s random-row
read, unreachable from in-kernel per-lane DMAs) and fuses EVERYTHING
else — triangle tests, slab tests, instancing, level scan, pruning,
nearest-child pop — into one Pallas kernel whose intermediates live in
VMEM/registers.

Layout: everything the kernel touches is TRANSPOSED — (words, lanes)
with lanes on the 128-wide minor axis — so per-lane scalars are
contiguous (1, B) rows, per-slot math is (BRANCH, B) tiles, and
reductions over slots run across sublanes.  The kernel processes the
row popped by the PREVIOUS call and ends by popping the next child
(with integrated per-level pruning), so the device loop is just::

    row_t = rows[ptr].T
    state = walk_kernel(state, row_t)     # updates ptr in-place

Pending-set representation: there are NO per-level bitmasks.  A
level's pending set lives entirely in its quantized entry codes
(``tcodes``): a slot is pending iff its code is a valid 16-bit
distance (< _SENT); absent and already-popped slots carry the _SENT
sentinel.  Pops write _SENT; pushes overwrite the whole level.  This
folds the mask bookkeeping the jnp walker needs (it keeps codes for
ALL slots and bits for pending ones) into the min-reductions the pop
does anyway, and lets one fused per-level loop do push-merge, prune,
deepest-live-level scan and nearest-child argmin together.  Pruning is
free: a level is live iff its nearest pending code can still beat the
best hit; since the threshold (floor(min_dist*sq)+1) only decreases
during a walk, dead levels stay dead without being cleared.

The ray registers (origin/direction/inverse/noid — constant between
reseeds) are a read-only kernel input, not aliased state: the kernel
never writes them back, saving 12 rows of output DMA per iteration.

Traversal semantics are identical to ops/mbvh._walk_body (itself a
vector re-engineering of the per-thread stack walk in
chroma/cuda/mesh.h:41): nearest-first popping via 16-bit quantized
entry distances, lazy pruning against the best hit, TLAS/BLAS
instancing with rigid ray transforms at entry rows.  Final results are
bit-identical to the jnp walker (tests/test_mbvh_pallas.py).
"""
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chroma_tpu.bvh.mbvh import (ROW_WIDTH, HDR_KIND, HDR_BASE, BOX_OFF,
                                 QORIGIN_OFF, QSCALE_OFF, QVERT_OFF,
                                 QVERT_WORDS_PER_COMP, TRI_ID_OFF,
                                 MAT_OFF, BRANCH,
                                 IBOX_ORIGIN_OFF, IBOX_SCALE_OFF,
                                 XFORM_OFF, TRI_BASE_OFF,
                                 KIND_CLUSTER, KIND_LOCAL, KIND_ENTRY)
from chroma_tpu.ops.mbvh import tquant_scale

DEFAULT_BLOCK = int(os.environ.get('CHROMA_TPU_PALLAS_BLOCK', 128))
# profiling-only cost mock: see vcomp in _make_kernel
_MOCK_F32V = os.environ.get('CHROMA_TPU_MOCK_F32V') == '1'
                        # lanes per kernel block

# Mosaic only lowers on real TPUs; everywhere else (the CPU test
# backend, the virtual multi-chip mesh) run the kernel interpreted.
# Resolved lazily — the backend is not final at import time.
def _interpret():
    return jax.default_backend() != 'tpu'

# uregs rows
U_PTR, U_ACT, U_LVL, U_TRI, U_MAT, U_LHT, U_TBASE, U_PAD = range(8)
# rays rows (read-only input): org 0:3, dir 3:6, inv 6:9, noid 9:12
R_ORG, R_DIR, R_INV, R_NOID = 0, 3, 6, 9
# hregs rows (hit state): min_dist 0, best_norm 1:4
H_MIN, H_NRM = 0, 1
# iregs rows (instanced only): irot 0:9, iorg 9:12, idir 12:15,
# iinv 15:18, inoid 18:21, pad 21:24
I_ROT, I_ORG, I_DIR, I_INV, I_NOID, I_ROWS = 0, 9, 12, 15, 18, 24

_SENT = 1 << 16          # conceptual sentinel (unbiased code space)
# Stored tcodes are BIASED int16: stored = code - 32768 with codes
# clipped to [0, 65534], sentinel stored as 32767 (int16 max).  The
# bias preserves ordering exactly, halves the walker's dominant state
# DMA (tcodes are (D*BRANCH, n) and the iteration is volume-bound on
# the state round trip — tools/profile_walk_kernel.py), and keeps the
# sentinel strictly greater than any valid code or prune threshold.
_BIAS = 32768
_SENT16 = 32767


def nslots(depth):
    """Pending-set slots carried in walker state.

    Level 0 (the root row itself) never holds a pending set — ``seed``
    slab-tests the root's children inline and parks them at level 1,
    and in-kernel pushes go to ``lvl_cur + 1 >= 2`` — so slot ``s``
    stores tree level ``s + 1`` and the dead level-0 rows are not
    carried (saves BRANCH i16 rows of state DMA per lane-iteration
    and one level of the fused scan)."""
    return max(depth - 1, 1)


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _make_kernel(depth, instanced, do_prune=True, ondeck=False,
                 od_slots=1):
    """Kernel body closure for a static (depth, instanced, do_prune).

    ``do_prune=False`` disables the per-level prune, making the pop
    sequence (and therefore the fused driver's service cadence and RNG
    pairing) exactly equal to the jnp walker at prune='off' — used by
    the bit-equality tests.  With pruning on, a lane can drain one
    iteration earlier than the jnp walker (the prune threshold here is
    one row fresher), which only re-pairs RNG draws.

    ``ondeck=True`` adds the drain-restart path: each lane carries a
    pre-seeded ON-DECK ray (od_* inputs, written only by the service
    pass).  The iteration a lane's walk drains, the kernel parks the
    finished results in the ``park`` registers and immediately restarts
    the lane on the on-deck ray — instead of idling until the next
    service pass (the dominant loss at service_every=10: util 0.59).
    Bookkeeping bits live in uregs[U_PAD]: bit0 ``parked`` (park holds
    unconsumed results; also means the on-deck slot was consumed),
    bit1 ``done`` (live registers hold an unserviced finished walk).

    On-deck slots are LIGHT: each carries only the ray, the last-hit
    triangle and a valid flag (od_rays 6 rows + od_uregs 2 rows) — the
    restarted walk's slot-0 pending set is seeded IN-KERNEL from the
    root row, which rides along as a (ROW_WIDTH, 1) broadcast constant
    input.  That keeps BRANCH i16 rows of pre-seeded codes out of the
    per-lane state DMA and the root slab test out of the service pass
    (compute has slack in this kernel; state DMA does not).

    ``od_slots=2`` adds a SECOND on-deck slot (od2_*): a lane whose
    restarted walk ALSO drains inside the window parks those results in
    ``park2`` and restarts once more (pad bit2 = park2 occupied).  The
    service must only fill od2 on lanes whose od1 slot is filled (the
    cascade consumes od1 first)."""
    D = depth
    S = nslots(depth)

    def kernel(*refs):
        if ondeck and od_slots == 2:
            (sq_ref, rbase_ref, rcount_ref, root_ref, row_ref,
             od_rays_ref, od_uregs_ref, od2_rays_ref, od2_uregs_ref,
             rays_ref, tcodes_ref, bases_ref, uregs_ref, hregs_ref,
             iregs_ref, park_ref, park2_ref, orays_ref, otcodes_ref,
             obases_ref, ouregs_ref, ohregs_ref, oiregs_ref, opark_ref,
             opark2_ref) = refs
        elif ondeck:
            (sq_ref, rbase_ref, rcount_ref, root_ref, row_ref,
             od_rays_ref, od_uregs_ref, rays_ref, tcodes_ref,
             bases_ref, uregs_ref, hregs_ref, iregs_ref, park_ref,
             orays_ref, otcodes_ref, obases_ref, ouregs_ref,
             ohregs_ref, oiregs_ref, opark_ref) = refs
        else:
            (sq_ref, row_ref, rays_ref, tcodes_ref, bases_ref,
             uregs_ref, hregs_ref, iregs_ref, otcodes_ref, obases_ref,
             ouregs_ref, ohregs_ref, oiregs_ref) = refs
        sq = sq_ref[0, 0]
        b = row_ref.shape[1]
        iota_slot = jax.lax.broadcasted_iota(jnp.int32, (BRANCH, b), 0)

        row = row_ref[:, :]                       # (ROW_WIDTH, B) u32
        act = uregs_ref[U_ACT:U_ACT + 1, :] != 0  # (1, B)
        lvl_cur = _i32(uregs_ref[U_LVL:U_LVL + 1, :])
        hdr = row[HDR_KIND:HDR_KIND + 1, :]
        count = _i32(hdr >> jnp.uint32(8))
        is_cluster = act & ((hdr & jnp.uint32(KIND_CLUSTER)) != 0)
        is_internal = act & ((hdr & jnp.uint32(KIND_CLUSTER)) == 0)

        org = rays_ref[R_ORG:R_ORG + 3, :]
        dirv = rays_ref[R_DIR:R_DIR + 3, :]
        inv_dir = rays_ref[R_INV:R_INV + 3, :]
        noid = rays_ref[R_NOID:R_NOID + 3, :]
        min_dist = hregs_ref[H_MIN:H_MIN + 1, :]
        lht = _i32(uregs_ref[U_LHT:U_LHT + 1, :])

        # ---- instancing: entry rows move the ray into the instance
        # frame; LOCAL rows are tested with the instance-frame ray ----
        if instanced:
            is_entry = act & ((hdr & jnp.uint32(KIND_ENTRY)) != 0)
            frame_local = (hdr & jnp.uint32(KIND_LOCAL)) != 0
            xf = _f32(row[XFORM_OFF:XFORM_OFF + 12, :])   # (12, B)
            omt = org - xf[9:12, :]
            iorg_new = jnp.concatenate(
                [(xf[0 + k:1 + k, :] * omt[0:1, :]
                  + xf[3 + k:4 + k, :] * omt[1:2, :]
                  + xf[6 + k:7 + k, :] * omt[2:3, :])
                 for k in range(3)], axis=0)
            idir_new = jnp.concatenate(
                [(xf[0 + k:1 + k, :] * dirv[0:1, :]
                  + xf[3 + k:4 + k, :] * dirv[1:2, :]
                  + xf[6 + k:7 + k, :] * dirv[2:3, :])
                 for k in range(3)], axis=0)
            ent = is_entry                                 # (1, B)
            irot = jnp.where(ent, xf[0:9, :], iregs_ref[I_ROT:I_ROT + 9, :])
            iorg = jnp.where(ent, iorg_new, iregs_ref[I_ORG:I_ORG + 3, :])
            idir = jnp.where(ent, idir_new, iregs_ref[I_DIR:I_DIR + 3, :])
            iinv = jnp.where(ent, 1.0 / idir_new,
                             iregs_ref[I_INV:I_INV + 3, :])
            inoid = jnp.where(ent, -iorg_new * (1.0 / idir_new),
                              iregs_ref[I_NOID:I_NOID + 3, :])
            tri_base = jnp.where(
                is_entry, _i32(row[TRI_BASE_OFF:TRI_BASE_OFF + 1, :]),
                _i32(uregs_ref[U_TBASE:U_TBASE + 1, :]))
            fl = frame_local
            e_org = jnp.where(fl, iorg, org)
            e_dir = jnp.where(fl, idir, dirv)
            e_inv = jnp.where(fl, iinv, inv_dir)
            e_noid = jnp.where(fl, inoid, noid)
        else:
            e_org, e_dir = org, dirv
            e_inv, e_noid = inv_dir, noid

        # ---- cluster row: Moller-Trumbore all BRANCH triangles ------
        qorigin = _f32(row[QORIGIN_OFF:QORIGIN_OFF + 3, :])  # (3, B)
        qscale = _f32(row[QSCALE_OFF:QSCALE_OFF + 3, :])

        def vcomp(j):
            w = row[QVERT_OFF + j * QVERT_WORDS_PER_COMP:
                    QVERT_OFF + (j + 1) * QVERT_WORDS_PER_COMP, :]
            if _MOCK_F32V:
                # COST MOCK (wrong values): what vcomp would cost with
                # f32 vertex rows — one bitcast, no unpack/convert/
                # scale chain.  Profiling only (CHROMA_TPU_MOCK_F32V).
                q = _f32(w)
                return jnp.concatenate([q, q], axis=0)
            # u32 -> f32 converts are unsupported in Mosaic: bitcast to
            # i32 first (values are < 2^16, so the sign is safe)
            lo = _i32(w & jnp.uint32(0xFFFF)).astype(jnp.float32)
            hi = _i32(w >> jnp.uint32(16)).astype(jnp.float32)
            q = jnp.concatenate([lo, hi], axis=0)          # (BRANCH, B)
            k = j % 3
            return q * qscale[k:k + 1, :] + qorigin[k:k + 1, :]

        v0 = [vcomp(j) for j in range(3)]
        v1 = [vcomp(j) for j in range(3, 6)]
        v2 = [vcomp(j) for j in range(6, 9)]
        d3 = [e_dir[k:k + 1, :] for k in range(3)]
        o3 = [e_org[k:k + 1, :] for k in range(3)]
        e1 = [v1[k] - v0[k] for k in range(3)]
        e2 = [v2[k] - v0[k] for k in range(3)]

        def cross3(a, bb):
            return [a[1] * bb[2] - a[2] * bb[1],
                    a[2] * bb[0] - a[0] * bb[2],
                    a[0] * bb[1] - a[1] * bb[0]]

        def dot3(a, bb):
            return a[0] * bb[0] + a[1] * bb[1] + a[2] * bb[2]

        h = cross3(d3, e2)
        a = dot3(e1, h)
        not_par = jnp.abs(a) > 1.1920929e-07
        f = 1.0 / jnp.where(not_par, a, 1.0)
        sv = [o3[k] - v0[k] for k in range(3)]
        u_b = f * dot3(sv, h)
        q3 = cross3(sv, e1)
        v_b = f * dot3(d3, q3)
        t_d = f * dot3(e2, q3)
        eps = 1e-6
        t_hit = (not_par & (u_b >= -eps) & (u_b <= 1.0 + eps)
                 & (v_b >= -eps) & (u_b + v_b <= 1.0 + eps)
                 & (t_d > eps))

        tri_ids = _i32(row[TRI_ID_OFF:TRI_ID_OFF + BRANCH, :])
        if instanced:
            tri_ids = tri_ids + jnp.where(frame_local, tri_base, 0)
        valid = (t_hit & (iota_slot < count) & (tri_ids != lht))
        t_dist = jnp.where(valid, t_d, jnp.inf)
        cl_dist = jnp.min(t_dist, axis=0, keepdims=True)   # (1, B)
        slot_min = jnp.min(jnp.where(t_dist == cl_dist, iota_slot,
                                     BRANCH), axis=0, keepdims=True)
        oh = iota_slot == slot_min                         # (BRANCH, B)

        improved = is_cluster & (cl_dist < min_dist)
        norm_c = cross3(e1, e2)

        def pick(arr):
            return jnp.sum(jnp.where(oh, arr, 0), axis=0, keepdims=True)

        best_tri = jnp.where(improved, pick(tri_ids),
                             _i32(uregs_ref[U_TRI:U_TRI + 1, :]))
        min_dist = jnp.where(improved, cl_dist, min_dist)
        nl = [pick(norm_c[k]) for k in range(3)]
        if instanced:
            nw3 = [irot[3 * r + 0:3 * r + 1, :] * nl[0]
                   + irot[3 * r + 1:3 * r + 2, :] * nl[1]
                   + irot[3 * r + 2:3 * r + 3, :] * nl[2]
                   for r in range(3)]
            nl = [jnp.where(frame_local, nw3[k], nl[k]) for k in range(3)]
        norm_new = jnp.concatenate(nl, axis=0)             # (3, B)
        best_norm = jnp.where(improved, norm_new,
                              hregs_ref[H_NRM:H_NRM + 3, :])
        mats = row[MAT_OFF:MAT_OFF + BRANCH, :]
        best_mat = jnp.where(improved, _u32(pick(_i32(mats))),
                             uregs_ref[U_MAT:U_MAT + 1, :])

        # ---- internal row: slab-test all BRANCH child AABBs ---------
        tmin = None
        tmax = None
        for k in range(3):
            pk = row[BOX_OFF + k * BRANCH:BOX_OFF + (k + 1) * BRANCH, :]
            bo = _f32(row[IBOX_ORIGIN_OFF + k:IBOX_ORIGIN_OFF + k + 1, :])
            bs = _f32(row[IBOX_SCALE_OFF + k:IBOX_SCALE_OFF + k + 1, :])
            lok = bo + _i32(pk & jnp.uint32(0xFFFF)).astype(
                jnp.float32) * bs
            hik = bo + _i32(pk >> jnp.uint32(16)).astype(
                jnp.float32) * bs
            t0 = lok * e_inv[k:k + 1, :] + e_noid[k:k + 1, :]
            t1 = hik * e_inv[k:k + 1, :] + e_noid[k:k + 1, :]
            finite = jnp.isfinite(e_inv[k:k + 1, :])
            small = jnp.where(finite, jnp.minimum(t0, t1), -jnp.inf)
            big = jnp.where(finite, jnp.maximum(t0, t1), jnp.inf)
            tmin = small if tmin is None else jnp.maximum(tmin, small)
            tmax = big if tmax is None else jnp.minimum(tmax, big)
        tmin = jnp.maximum(tmin, 0.0)
        b_ok = (tmin <= tmax) & (tmin <= min_dist) & (iota_slot < count)
        # biased-i16 code space (see _BIAS above); level math runs in
        # i32 (Mosaic has no i16 reductions), only the HBM-resident
        # tcodes state is i16
        newcodes = (jnp.where(
            b_ok, jnp.clip(jnp.floor(tmin * sq), 0.0, 65534.0),
            65535.0) - float(_BIAS)).astype(jnp.int32)     # (BRANCH, B)
        push = (is_internal
                & (jnp.min(newcodes, axis=0, keepdims=True) < _SENT16)
                & (lvl_cur + 1 < D))
        newbase = _i32(row[HDR_BASE:HDR_BASE + 1, :])

        # ---- fused per-level loop: push-merge + prune + deepest-live
        # scan.  A level is live iff its nearest pending code can still
        # beat the best hit; the threshold only decreases during a
        # walk, so dead levels stay dead without being cleared --------
        if do_prune:
            thresh = (jnp.clip(jnp.floor(min_dist * sq) + 1.0, 0.0,
                               65534.0) - float(_BIAS)) \
                .astype(jnp.int32)                         # (1, B)
        else:
            thresh = jnp.full((1, b), _SENT16 - 1, jnp.int32)
        # slot s holds tree level s + 1 (level 0 is never pending —
        # see nslots)
        tcodes = tcodes_ref[:, :].astype(jnp.int32)        # (S*BRANCH,B)
        bases = bases_ref[:, :]                            # (S, B)
        lvl = jnp.full_like(lvl_cur, -1)
        tl_sel = jnp.full((BRANCH, b), _SENT16, jnp.int32)
        base_sel = jnp.zeros_like(lvl_cur)
        new_tcodes = []
        new_bases = []
        for s in range(S):
            l = s + 1
            sel = push & (lvl_cur + 1 == l)                # (1, B)
            tc_l = jnp.where(sel, newcodes,
                             tcodes[s * BRANCH:(s + 1) * BRANCH, :])
            b_l = jnp.where(sel, newbase, bases[s:s + 1, :])
            m_l = jnp.min(tc_l, axis=0, keepdims=True)     # (1, B)
            live = m_l <= thresh                           # pending+near
            lvl = jnp.where(live, l, lvl)                  # deepest wins
            tl_sel = jnp.where(live, tc_l, tl_sel)
            base_sel = jnp.where(live, b_l, base_sel)
            new_tcodes.append(tc_l)
            new_bases.append(b_l)

        # ---- pop: nearest pending child of the deepest live level ---
        act_n = lvl >= 0
        m = jnp.min(tl_sel, axis=0, keepdims=True)
        c = jnp.min(jnp.where(tl_sel == m, iota_slot, BRANCH), axis=0,
                    keepdims=True)                         # (1, B)
        for s in range(S):
            on_l = lvl == s + 1
            new_tcodes[s] = jnp.where(on_l & (iota_slot == c), _SENT16,
                                      new_tcodes[s])
        ptr_n = jnp.where(act_n, _u32(base_sel) + _u32(c),
                          jnp.uint32(0))

        # ---- outputs (ondeck may override below) ---------------------
        act_out = jnp.where(act_n, jnp.uint32(1), jnp.uint32(0))
        lvl_out = _u32(lvl)
        tri_out = _u32(best_tri)
        mat_out = best_mat
        lht_out = uregs_ref[U_LHT:U_LHT + 1, :]
        tbase_out = (_u32(tri_base) if instanced
                     else uregs_ref[U_TBASE:U_TBASE + 1, :])
        pad_out = uregs_ref[U_PAD:U_PAD + 1, :]
        md_out = min_dist
        nrm_out = best_norm

        if ondeck:
            pad_in = _i32(pad_out)
            parked = (pad_in & 1) != 0
            done = ((pad_in & 2) != 0) | (act & ~act_n)
            od_act = od_uregs_ref[0:1, :] != jnp.uint32(0)
            swap1 = done & (~act_n) & (~parked) & od_act
            if od_slots == 2:
                parked2 = (pad_in & 4) != 0
                od2_act = od2_uregs_ref[0:1, :] != jnp.uint32(0)
                swap2 = done & (~act_n) & parked & (~parked2) & od2_act
                swap = swap1 | swap2
            else:
                swap = swap1

            # park the finished walk's results; restart on the on-deck
            # ray (live registers reset exactly as ``seed`` would)
            park_new = jnp.concatenate([
                md_out, nrm_out, _f32(_i32(tri_out)),
                _f32(_i32(mat_out))], axis=0)
            opark_ref[:, :] = jnp.where(swap1, park_new, park_ref[:, :])
            od_org = od_rays_ref[0:3, :]
            od_dir = od_rays_ref[3:6, :]
            od_lht = od_uregs_ref[1:2, :]
            if od_slots == 2:
                opark2_ref[:, :] = jnp.where(swap2, park_new,
                                             park2_ref[:, :])
                od_org = jnp.where(swap2, od2_rays_ref[0:3, :], od_org)
                od_dir = jnp.where(swap2, od2_rays_ref[3:6, :], od_dir)
                od_lht = jnp.where(swap2, od2_uregs_ref[1:2, :], od_lht)
            od_inv = 1.0 / od_dir
            od_noid = -od_org * od_inv
            orays_ref[:, :] = jnp.where(
                swap,
                jnp.concatenate([od_org, od_dir, od_inv, od_noid],
                                axis=0),
                rays_ref[:, :])
            md_out = jnp.where(swap, jnp.inf, md_out)
            nrm_out = jnp.where(swap, 0.0, nrm_out)
            tri_out = jnp.where(swap, jnp.uint32(0xFFFFFFFF), tri_out)
            mat_out = jnp.where(swap, jnp.uint32(0), mat_out)
            lht_out = jnp.where(swap, od_lht, lht_out)
            tbase_out = jnp.where(swap, jnp.uint32(0), tbase_out)

            # ---- inline root seed for the restarted ray: slab-test
            # the root's children against the on-deck ray (exactly
            # ``seed``'s math) and pop the nearest — the restarted walk
            # costs no extra iteration and no pre-seeded codes ride in
            # the per-lane state.  The root child boxes arrive
            # DEQUANTIZED as a (6*BRANCH, 1) constant (root_ref) and
            # the child count as an SMEM scalar: Mosaic cannot
            # broadcast a (1,1) vector across both axes, so nothing
            # here may source a (1,1) from VMEM --------------------
            if D >= 2:
                stmin = None
                stmax = None
                for k in range(3):
                    lok = root_ref[(2 * k) * BRANCH:
                                   (2 * k + 1) * BRANCH, :]
                    hik = root_ref[(2 * k + 1) * BRANCH:
                                   (2 * k + 2) * BRANCH, :]
                    t0 = lok * od_inv[k:k + 1, :] + od_noid[k:k + 1, :]
                    t1 = hik * od_inv[k:k + 1, :] + od_noid[k:k + 1, :]
                    finite = jnp.isfinite(od_inv[k:k + 1, :])
                    small = jnp.where(finite, jnp.minimum(t0, t1),
                                      -jnp.inf)
                    big = jnp.where(finite, jnp.maximum(t0, t1),
                                    jnp.inf)
                    stmin = small if stmin is None \
                        else jnp.maximum(stmin, small)
                    stmax = big if stmax is None \
                        else jnp.minimum(stmax, big)
                stmin = jnp.maximum(stmin, 0.0)
                sb_ok = ((stmin <= stmax)
                         & (iota_slot < rcount_ref[0, 0]))
                scodes = (jnp.where(
                    sb_ok, jnp.clip(jnp.floor(stmin * sq), 0.0,
                                    65534.0),
                    65535.0) - float(_BIAS)).astype(jnp.int32)
                sm = jnp.min(scodes, axis=0, keepdims=True)
                sc = jnp.min(jnp.where((scodes == sm) & sb_ok,
                                       iota_slot, BRANCH),
                             axis=0, keepdims=True)      # (1, B)
                s_act = jnp.any(sb_ok, axis=0, keepdims=True)
                seed_tc = jnp.where(iota_slot == sc, _SENT16, scodes)
                seed_ptr = jnp.where(
                    s_act, _u32(rbase_ref[0, 0] + sc), jnp.uint32(0))
                seed_lvl = jnp.uint32(1)
            else:
                # root is a single cluster row: pop it directly
                s_act = jnp.ones_like(swap)
                seed_tc = jnp.full((BRANCH, b), _SENT16, jnp.int32)
                seed_ptr = jnp.zeros((1, b), jnp.uint32)
                seed_lvl = jnp.uint32(0)

            ptr_n = jnp.where(swap, seed_ptr, ptr_n)
            act_out = jnp.where(
                swap, jnp.where(s_act, jnp.uint32(1), jnp.uint32(0)),
                act_out)
            lvl_out = jnp.where(swap, seed_lvl, lvl_out)
            new_tcodes[0] = jnp.where(swap, seed_tc, new_tcodes[0])
            for s in range(1, S):
                new_tcodes[s] = jnp.where(swap, _SENT16, new_tcodes[s])
            new_bases[0] = jnp.where(swap, rbase_ref[0, 0],
                                     new_bases[0])
            bits = (jnp.where(parked | swap1, 1, 0)
                    | jnp.where(done & ~swap, 2, 0))
            if od_slots == 2:
                bits = bits | jnp.where(parked2 | swap2, 4, 0)
            pad_out = _u32(bits)

        # ---- commit --------------------------------------------------
        otcodes_ref[:, :] = jnp.concatenate(new_tcodes,
                                            axis=0).astype(jnp.int16)
        obases_ref[:, :] = jnp.concatenate(new_bases, axis=0)
        ouregs_ref[:, :] = jnp.concatenate([
            ptr_n, act_out, lvl_out, tri_out, mat_out, lht_out,
            tbase_out, pad_out], axis=0)
        ohregs_ref[:, :] = jnp.concatenate([md_out, nrm_out], axis=0)
        if instanced:
            oiregs_ref[:, :] = jnp.concatenate(
                [irot, iorg, idir, iinv, inoid,
                 iregs_ref[I_NOID + 3:I_ROWS, :]], axis=0)
        else:
            oiregs_ref[:, :] = iregs_ref[:, :]

    return kernel


# walker-state arrays: rays is a read-only input (never written by the
# kernel); the rest are input/output-aliased
_RO_KEYS = ('rays',)
_RW_KEYS = ('tcodes', 'bases', 'uregs', 'hregs', 'iregs')
W_KEYS = _RO_KEYS + _RW_KEYS
# ondeck mode: the od_* arrays are service-written kernel inputs
# (ray + [valid, lht] per slot; the slot-0 pending set is seeded
# in-kernel from the root row); rays becomes read-write (the swap
# loads the on-deck ray into it) and the park registers hold the
# swapped-out walk's results
OD_RO_KEYS = ('od_rays', 'od_uregs')
OD_RW_KEYS = ('rays', 'tcodes', 'bases', 'uregs', 'hregs', 'iregs',
              'park')
OD_W_KEYS = OD_RO_KEYS + OD_RW_KEYS
# two-slot ondeck: a second slot and a second park register set
OD2_RO_KEYS = OD_RO_KEYS + ('od2_rays', 'od2_uregs')
OD2_RW_KEYS = OD_RW_KEYS + ('park2',)
OD2_W_KEYS = OD2_RO_KEYS + OD2_RW_KEYS


def od_w_keys(od_slots):
    return OD2_W_KEYS if od_slots == 2 else OD_W_KEYS


@partial(jax.jit, static_argnames=('depth', 'instanced', 'block',
                                   'do_prune', 'ondeck', 'od_slots'))
def walk_iter(row_t, W, depth, instanced, sq, block=DEFAULT_BLOCK,
              do_prune=True, ondeck=False, rbase=None, od_slots=1,
              root_lohi=None, rcount=None):
    """One walker iteration over all lanes.

    ``row_t``: (ROW_WIDTH, n) u32 — transposed gathered rows.
    ``W``: walker-state dict (see ``seed``); returned updated, with
    ``W['uregs'][U_PTR]`` the next row to gather and ``U_ACT`` the
    live flag.  ``W['rays']`` is passed through untouched (non-ondeck
    mode only; the ondeck swap rewrites it).

    ``ondeck``: enable the drain-restart path (see ``_make_kernel``).
    ``W`` must then also carry the ``od_*``/``park`` arrays
    (``ondeck_empty``/``od_slot_seed``), ``rbase``/``rcount`` must be
    the root row's HDR_BASE / child count (i32 scalars) and
    ``root_lohi`` the root's dequantized child boxes from
    ``root_boxes_lohi(geom)`` — the in-kernel restart seed slab-tests
    them.  ``od_slots=2`` adds the second slot's arrays.
    """
    n0 = row_t.shape[1]
    b = block
    # Mosaic requires whole blocks on the lane axis: DMA of a ragged
    # tail block reads past the buffer (device fault), and n // b
    # would skip it entirely.  Pad to a block multiple and slice the
    # result back (pad lanes have uregs=0 => inactive; their outputs
    # are discarded).  Hot callers keep lane widths block-aligned so
    # this is the exception path.
    pad = (-n0) % b
    if pad:
        row_t = jnp.pad(row_t, ((0, 0), (0, pad)))
        W = {k: jnp.pad(v, ((0, 0), (0, pad))) for k, v in W.items()}
    n = n0 + pad
    grid = (n // b,)
    D = depth
    S = nslots(D)
    kern = _make_kernel(D, instanced, do_prune, ondeck=ondeck,
                        od_slots=od_slots)

    def spec(rows_):
        return pl.BlockSpec((rows_, b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    sq_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)

    shapes = dict(rays=(12, n), tcodes=(S * BRANCH, n), bases=(S, n),
                  uregs=(8, n), hregs=(4, n), iregs=(I_ROWS, n),
                  od_rays=(6, n), od_uregs=(2, n), park=(6, n),
                  od2_rays=(6, n), od2_uregs=(2, n), park2=(6, n))
    dtypes = dict(rays=jnp.float32, tcodes=jnp.int16, bases=jnp.int32,
                  uregs=jnp.uint32, hregs=jnp.float32, iregs=jnp.float32,
                  od_rays=jnp.float32, od_uregs=jnp.uint32,
                  park=jnp.float32, od2_rays=jnp.float32,
                  od2_uregs=jnp.uint32, park2=jnp.float32)

    if ondeck and od_slots == 2:
        ro_keys, rw_keys = OD2_RO_KEYS, OD2_RW_KEYS
    elif ondeck:
        ro_keys, rw_keys = OD_RO_KEYS, OD_RW_KEYS
    else:
        ro_keys, rw_keys = _RO_KEYS, _RW_KEYS
    scalars = [jnp.reshape(jnp.asarray(sq, jnp.float32), (1, 1))]
    lead_blocks = []
    lead_specs = []
    if ondeck:
        scalars.append(jnp.reshape(jnp.asarray(rbase, jnp.int32),
                                   (1, 1)))
        scalars.append(jnp.reshape(jnp.asarray(rcount, jnp.int32),
                                   (1, 1)))
        # the root's dequantized child boxes ride along as a
        # (6*BRANCH, 1) broadcast constant (the in-kernel restart seed
        # slab-tests against them)
        lead_blocks.append(root_lohi)
        lead_specs.append(pl.BlockSpec((6 * BRANCH, 1),
                                       lambda i: (0, 0),
                                       memory_space=pltpu.VMEM))
    n_lead = len(scalars) + len(lead_blocks) + 1   # + the row block
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[sq_spec] * len(scalars) + lead_specs
        + [spec(ROW_WIDTH)]
        + [spec(shapes[k][0]) for k in ro_keys + rw_keys],
        out_specs=tuple(spec(shapes[k][0]) for k in rw_keys),
        out_shape=tuple(jax.ShapeDtypeStruct(shapes[k], dtypes[k])
                        for k in rw_keys),
        input_output_aliases={i + n_lead + len(ro_keys): i
                              for i in range(len(rw_keys))},
        interpret=_interpret(),
    )(*scalars, *lead_blocks, row_t, *[W[k] for k in ro_keys + rw_keys])
    new = dict(zip(rw_keys, out))
    for k in ro_keys:
        new[k] = W[k]
    if pad:
        new = {k: v[:, :n0] for k, v in new.items()}
    return new


def seed(geom, depth, org_t, dir_t, lht, active):
    """Seed transposed walker state: root children slab-tested inline
    (the ops/mbvh.root_seed trick) AND the first pop done here, so the
    kernel never wastes an iteration on an empty 'process' phase.

    Args: org_t, dir_t (3, n) f32; lht (n,) i32; active (n,) bool.
    Returns the walker-state dict W.
    """
    n = org_t.shape[1]
    D = depth
    S = nslots(D)
    inv_t = 1.0 / dir_t
    noid_t = -org_t * inv_t

    # slot s <-> tree level s + 1 (see nslots)
    bases = jnp.zeros((S, n), jnp.int32)
    tcodes = jnp.full((S * BRANCH, n), _SENT16, jnp.int16)

    root = geom.mbvh_rows[0]
    sq = tquant_scale(geom)
    if int(geom.mbvh_depth) < 2 or D < 2:
        # root is a single cluster row: pop it directly
        ptr = jnp.zeros(n, jnp.uint32)
        act = active
        lvl = jnp.zeros(n, jnp.int32)
    else:
        iota_slot = jax.lax.broadcasted_iota(jnp.int32, (BRANCH, n), 0)
        tmin = None
        tmax = None
        for k in range(3):
            pk = root[BOX_OFF + k * BRANCH:
                      BOX_OFF + (k + 1) * BRANCH][:, None]
            bo = jax.lax.bitcast_convert_type(root[IBOX_ORIGIN_OFF + k],
                                              jnp.float32)
            bs = jax.lax.bitcast_convert_type(root[IBOX_SCALE_OFF + k],
                                              jnp.float32)
            lok = bo + (pk & jnp.uint32(0xFFFF)).astype(jnp.float32) * bs
            hik = bo + (pk >> jnp.uint32(16)).astype(jnp.float32) * bs
            t0 = lok * inv_t[k:k + 1, :] + noid_t[k:k + 1, :]
            t1 = hik * inv_t[k:k + 1, :] + noid_t[k:k + 1, :]
            finite = jnp.isfinite(inv_t[k:k + 1, :])
            small = jnp.where(finite, jnp.minimum(t0, t1), -jnp.inf)
            big = jnp.where(finite, jnp.maximum(t0, t1), jnp.inf)
            tmin = small if tmin is None else jnp.maximum(tmin, small)
            tmax = big if tmax is None else jnp.minimum(tmax, big)
        tmin = jnp.maximum(tmin, 0.0)
        count = (root[HDR_KIND] >> jnp.uint32(8)).astype(jnp.int32)
        b_ok = ((tmin <= tmax) & (iota_slot < count)
                & active[None, :])                         # (BRANCH, n)
        codes = (jnp.where(b_ok,
                           jnp.clip(jnp.floor(tmin * sq), 0.0, 65534.0),
                           65535.0) - float(_BIAS)) \
            .astype(jnp.int32).astype(jnp.int16)
        # first pop: nearest root child, ties to lowest slot
        m = jnp.min(codes, axis=0, keepdims=True)
        c = jnp.min(jnp.where((codes == m) & b_ok, iota_slot, BRANCH),
                    axis=0, keepdims=True)                 # (1, n)
        act = jnp.any(b_ok, axis=0)                        # (n,)
        codes = jnp.where(iota_slot == c, jnp.int16(_SENT16),
                          codes)                           # pop it
        tcodes = tcodes.at[0:BRANCH, :].set(codes)
        bases = bases.at[0:1, :].set(
            jnp.broadcast_to(root[HDR_BASE].astype(jnp.int32)[None,
                                                              None],
                             (1, n)))
        ptr = jnp.where(act, root[HDR_BASE] + _u32(c[0]).astype(
            jnp.uint32), jnp.uint32(0))
        lvl = jnp.ones(n, jnp.int32)

    uregs = jnp.stack([
        ptr,
        act.astype(jnp.uint32),
        _u32(lvl),
        _u32(jnp.full(n, -1, jnp.int32)),
        jnp.zeros(n, jnp.uint32),
        _u32(lht),
        jnp.zeros(n, jnp.uint32),
        jnp.zeros(n, jnp.uint32)], axis=0)
    rays = jnp.concatenate([org_t, dir_t, inv_t, noid_t], axis=0)
    hregs = jnp.concatenate([
        jnp.full((1, n), jnp.inf, jnp.float32),
        jnp.zeros((3, n), jnp.float32)], axis=0)
    iregs = jnp.zeros((I_ROWS, n), jnp.float32)
    if getattr(geom, 'mbvh_instanced', False):
        iregs = iregs.at[I_DIR:I_INV + 3, :].set(1.0)  # idir=iinv=1
    return dict(rays=rays, tcodes=tcodes, bases=bases, uregs=uregs,
                hregs=hregs, iregs=iregs)


def root_boxes_lohi(geom):
    """Dequantized root child AABBs for the in-kernel restart seed:
    (6*BRANCH, 1) f32, rows [lo_x | hi_x | lo_y | hi_y | lo_z | hi_z],
    dequantized exactly as ``seed`` does (same corners => bit-equal
    slab tests).  Zeros for depth<2 (the root is a cluster row and the
    restart pops it directly)."""
    if int(geom.mbvh_depth) < 2:
        return jnp.zeros((6 * BRANCH, 1), jnp.float32)
    root = geom.mbvh_rows[0]
    parts = []
    for k in range(3):
        pk = root[BOX_OFF + k * BRANCH:BOX_OFF + (k + 1) * BRANCH]
        bo = jax.lax.bitcast_convert_type(root[IBOX_ORIGIN_OFF + k],
                                          jnp.float32)
        bs = jax.lax.bitcast_convert_type(root[IBOX_SCALE_OFF + k],
                                          jnp.float32)
        parts.append(bo + (pk & jnp.uint32(0xFFFF)).astype(
            jnp.float32) * bs)
        parts.append(bo + (pk >> jnp.uint32(16)).astype(
            jnp.float32) * bs)
    return jnp.concatenate(parts)[:, None]


def ondeck_empty(n, od_slots=1):
    """Empty on-deck/park walker-state extras (ondeck mode): no on-deck
    ray (valid=0), nothing parked."""
    out = dict(od_rays=jnp.zeros((6, n), jnp.float32),
               od_uregs=jnp.zeros((2, n), jnp.uint32),
               park=jnp.zeros((6, n), jnp.float32))
    if od_slots == 2:
        out.update(od2_rays=jnp.zeros((6, n), jnp.float32),
                   od2_uregs=jnp.zeros((2, n), jnp.uint32),
                   park2=jnp.zeros((6, n), jnp.float32))
    return out


def od_slot_seed(org_t, dir_t, lht, valid, slot=1):
    """Seed a per-lane on-deck slot: only the ray, last-hit triangle
    and a valid flag travel — the restarted walk's slot-0 pending set
    is built IN-KERNEL from the root row at swap time (see
    _make_kernel), so no root slab test runs here and no pre-seeded
    codes ride in the walker state.  od_uregs rows = [valid, lht]."""
    pre = 'od_' if slot == 1 else 'od2_'
    return {pre + 'rays': jnp.concatenate([org_t, dir_t], axis=0),
            pre + 'uregs': jnp.stack([valid.astype(jnp.uint32),
                                      _u32(lht)], axis=0)}


def park_results(W, which='park'):
    """Traversal results parked by an in-kernel drain-restart swap
    (ondeck mode), standard (n,)/(n,3) layout.  ``which='park2'``
    reads the second slot's registers (pad bit2)."""
    p = W[which]
    bit = 1 if which == 'park' else 4
    return dict(
        triangle=jax.lax.bitcast_convert_type(p[4], jnp.int32),
        distance=p[0],
        normal=p[1:4].T,
        material_code=jax.lax.bitcast_convert_type(p[5], jnp.uint32),
        parked=(jax.lax.bitcast_convert_type(W['uregs'][U_PAD],
                                             jnp.int32) & bit) != 0,
    )


def results(W):
    """Extract (triangle, distance, normal, material_code, pending)
    from walker state, standard (n,)/(n,3) layout."""
    return dict(
        triangle=_i32(W['uregs'][U_TRI]),
        distance=W['hregs'][H_MIN],
        normal=W['hregs'][H_NRM:H_NRM + 3].T,
        material_code=W['uregs'][U_MAT],
        incomplete=W['uregs'][U_ACT] != 0,
    )


@partial(jax.jit, static_argnames=('max_iters', 'block'))
def intersect_mesh_pallas(origin, direction, geom, last_hit_triangle=None,
                          active=None, max_iters=512,
                          block=DEFAULT_BLOCK):
    """Closest-hit intersection via the Pallas walker (same contract as
    ops.mbvh.intersect_mesh; results bit-identical)."""
    n = origin.shape[0]
    if last_hit_triangle is None:
        last_hit_triangle = jnp.full(n, -1, jnp.int32)
    if active is None:
        active = jnp.ones(n, bool)
    depth = int(geom.mbvh_depth)
    instanced = bool(geom.mbvh_instanced)
    sq = tquant_scale(geom)

    W = seed(geom, depth, origin.T, direction.T, last_hit_triangle,
             active)
    rows = geom.mbvh_rows

    def cond(carry):
        W, it = carry
        return (it < max_iters) & jnp.any(W['uregs'][U_ACT] != 0)

    def body(carry):
        W, it = carry
        row_t = rows[_i32(W['uregs'][U_PTR])].T
        W = walk_iter(row_t, W, depth, instanced, sq, block=block)
        return W, it + 1

    W, _ = jax.lax.while_loop(cond, body,
                              (W, jnp.zeros((), jnp.int32)))
    return results(W)
