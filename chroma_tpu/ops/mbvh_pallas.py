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
VMEM/registers.  HBM traffic per lane-iteration drops to the row
(3.4 KB) + the walker state (~2.5 KB), a ~20-25 ns floor.

Layout: everything the kernel touches is TRANSPOSED — (words, lanes)
with lanes on the 128-wide minor axis — so per-lane scalars are
contiguous (1, B) rows, per-slot math is (BRANCH, B) tiles, and
reductions over slots run across sublanes.  The kernel processes the
row popped by the PREVIOUS call and ends by popping the next child
(with integrated per-level pruning), so the device loop is just::

    row_t = rows[ptr].T
    state = walk_kernel(state, row_t)     # updates ptr in-place

Traversal semantics are identical to ops/mbvh._walk_body (itself a
vector re-engineering of the per-thread stack walk in
chroma/cuda/mesh.h:41): nearest-first popping via 16-bit quantized
entry distances, lazy pruning against the best hit (here whole levels
are cleared when their nearest pending child is provably beyond the
best hit — pops always take the level minimum, so per-child pruning
and per-level pruning visit exactly the same rows), TLAS/BLAS
instancing with rigid ray transforms at entry rows.  Final results are
bit-identical to the jnp walker (tests/test_mbvh_pallas.py).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from chroma_tpu.bvh.mbvh import (ROW_WIDTH, HDR_KIND, HDR_BASE, BOX_OFF,
                                 QORIGIN_OFF, QSCALE_OFF, QVERT_OFF,
                                 QVERT_WORDS_PER_COMP, TRI_ID_OFF,
                                 MAT_OFF, BRANCH, NMASK_WORDS,
                                 IBOX_ORIGIN_OFF, IBOX_SCALE_OFF,
                                 XFORM_OFF, TRI_BASE_OFF,
                                 KIND_CLUSTER, KIND_LOCAL, KIND_ENTRY)
from chroma_tpu.ops.mbvh import tquant_scale

import os
DEFAULT_BLOCK = int(os.environ.get('CHROMA_TPU_PALLAS_BLOCK', 128))
                        # lanes per kernel block

# Mosaic only lowers on real TPUs; everywhere else (the CPU test
# backend, the virtual multi-chip mesh) run the kernel interpreted.
# Resolved lazily — the backend is not final at import time.
def _interpret():
    return jax.default_backend() != 'tpu'

# uregs rows
U_PTR, U_ACT, U_LVL, U_TRI, U_MAT, U_LHT, U_TBASE, U_PAD = range(8)
# fregs rows: org 0:3, dir 3:6, inv 6:9, noid 9:12, min_dist 12,
# best_norm 13:16
F_ORG, F_DIR, F_INV, F_NOID = 0, 3, 6, 9
F_MIN, F_NRM = 12, 13
# iregs rows (instanced only): irot 0:9, iorg 9:12, idir 12:15,
# iinv 15:18, inoid 18:21, pad 21:24
I_ROT, I_ORG, I_DIR, I_INV, I_NOID, I_ROWS = 0, 9, 12, 15, 18, 24

_BIG = 1 << 17


def _f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _bits_of(words):
    """(NW, B) u32 mask words -> (BRANCH, B) bool; slot s = bit s%32 of
    word s//32 (the ops/mbvh convention)."""
    nw, b = words.shape
    bit = (jnp.uint32(1) << jax.lax.broadcasted_iota(
        jnp.uint32, (32, b), 0))
    return jnp.concatenate(
        [(jnp.broadcast_to(words[w:w + 1, :], (32, b)) & bit) != 0
         for w in range(nw)], axis=0)


def _words_of(bits):
    """(BRANCH, B) bool -> (NW, B) u32 words (inverse of _bits_of).
    Summed in i32 (Mosaic has no unsigned reductions); the bits are
    disjoint so sum == or, and the pattern survives the sign bit."""
    nb, b = bits.shape
    bit = _i32(jnp.uint32(1) << jax.lax.broadcasted_iota(
        jnp.uint32, (32, b), 0))
    return jnp.concatenate(
        [_u32(jnp.sum(jnp.where(bits[w * 32:(w + 1) * 32, :], bit, 0),
                      axis=0, keepdims=True))
         for w in range(nb // 32)], axis=0)


def _make_kernel(depth, instanced, do_prune=True):
    """Kernel body closure for a static (depth, instanced, do_prune).

    ``do_prune=False`` disables the per-level prune, making the pop
    sequence (and therefore the fused driver's service cadence and RNG
    pairing) exactly equal to the jnp walker at prune='off' — used by
    the bit-equality tests.  With pruning on, a lane can drain one
    iteration earlier than the jnp walker (the prune threshold here is
    one row fresher), which only re-pairs RNG draws."""
    D = depth

    def kernel(sq_ref, row_ref, masks_ref, bases_ref, tcodes_ref,
               uregs_ref, fregs_ref, iregs_ref, omasks_ref, obases_ref,
               otcodes_ref, ouregs_ref, ofregs_ref, oiregs_ref):
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

        org = fregs_ref[F_ORG:F_ORG + 3, :]
        dirv = fregs_ref[F_DIR:F_DIR + 3, :]
        inv_dir = fregs_ref[F_INV:F_INV + 3, :]
        noid = fregs_ref[F_NOID:F_NOID + 3, :]
        min_dist = fregs_ref[F_MIN:F_MIN + 1, :]
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
            # u32 -> f32 converts are unsupported in Mosaic: bitcast to
            # i32 first (values are < 2^16, so the sign is safe)
            w = row[QVERT_OFF + j * QVERT_WORDS_PER_COMP:
                    QVERT_OFF + (j + 1) * QVERT_WORDS_PER_COMP, :]
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
                              fregs_ref[F_NRM:F_NRM + 3, :])
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
        hit_bits = b_ok & is_internal                      # (BRANCH, B)
        hitwords = _words_of(hit_bits)                     # (NW, B)
        newcodes = jnp.where(
            b_ok, jnp.clip(jnp.floor(tmin * sq), 0.0, 65535.0),
            65535.0).astype(jnp.int32)                     # (BRANCH, B)

        push = (is_internal
                & jnp.any(hit_bits, axis=0, keepdims=True)
                & (lvl_cur + 1 < D))

        # ---- state writeback + push at level lvl_cur+1 (static) -----
        masks = masks_ref[:, :]                            # (D*NW, B)
        tcodes = tcodes_ref[:, :]                          # (D*BRANCH,B) i32
        bases = bases_ref[:, :]                            # (D, B)
        new_masks = []
        new_tcodes = []
        new_bases = []
        for l in range(D):
            sel = push & (lvl_cur + 1 == l)                # (1, B)
            m_l = masks[l * NMASK_WORDS:(l + 1) * NMASK_WORDS, :]
            new_masks.append(jnp.where(sel, hitwords, m_l))
            t_l = tcodes[l * BRANCH:(l + 1) * BRANCH, :]
            new_tcodes.append(jnp.where(sel, newcodes, t_l))
            new_bases.append(jnp.where(
                sel, _i32(row[HDR_BASE:HDR_BASE + 1, :]),
                bases[l:l + 1, :]))

        # ---- pop for the next iteration (integrated pruning) --------
        # a level whose nearest pending child is beyond the best hit
        # can never improve it: clear it (pops always take the level
        # minimum, so per-level pruning visits exactly the same rows
        # as the jnp walker's per-child lazy prune)
        if do_prune:
            thresh = jnp.clip(jnp.floor(min_dist * sq) + 1.0, 0.0,
                              65535.0).astype(jnp.int32)   # (1, B)
        else:
            thresh = jnp.full_like(lvl_cur, _BIG - 1)
        lvl = jnp.full_like(lvl_cur, -1)
        for l in range(D):
            bits_l = _bits_of(new_masks[l])
            tl_l = jnp.where(bits_l, new_tcodes[l], _BIG)
            lmin_l = jnp.min(tl_l, axis=0, keepdims=True)  # (1, B)
            live = lmin_l <= thresh                        # pending+near
            new_masks[l] = jnp.where(live, new_masks[l], jnp.uint32(0))
            lvl = jnp.where(live, l, lvl)

        # select the deepest live level's codes/bits/base
        tl_sel = jnp.full((BRANCH, masks.shape[1]), _BIG, jnp.int32)
        base_sel = jnp.zeros_like(lvl)
        for l in range(D):
            on_l = lvl == l
            bits_l = _bits_of(new_masks[l])
            tl_l = jnp.where(bits_l, new_tcodes[l], _BIG)
            tl_sel = jnp.where(on_l, tl_l, tl_sel)
            base_sel = jnp.where(on_l, new_bases[l], base_sel)
        act_n = lvl >= 0
        m = jnp.min(tl_sel, axis=0, keepdims=True)
        c = jnp.min(jnp.where(tl_sel == m, iota_slot, BRANCH), axis=0,
                    keepdims=True)                         # (1, B)
        oh_c = (iota_slot == c) & act_n
        pat = _words_of(oh_c)                              # (NW, B)
        for l in range(D):
            on_l = (lvl == l) & act_n
            new_masks[l] = jnp.where(on_l, new_masks[l] ^ pat,
                                     new_masks[l])
        ptr_n = jnp.where(act_n, _u32(base_sel) + _u32(c),
                          jnp.uint32(0))

        # ---- commit --------------------------------------------------
        omasks_ref[:, :] = jnp.concatenate(new_masks, axis=0)
        otcodes_ref[:, :] = jnp.concatenate(new_tcodes, axis=0)
        obases_ref[:, :] = jnp.concatenate(new_bases, axis=0)
        ouregs_ref[:, :] = jnp.concatenate([
            ptr_n,
            jnp.where(act_n, jnp.uint32(1), jnp.uint32(0)),
            _u32(lvl),
            _u32(best_tri),
            best_mat,
            uregs_ref[U_LHT:U_LHT + 1, :],
            (_u32(tri_base) if instanced
             else uregs_ref[U_TBASE:U_TBASE + 1, :]),
            uregs_ref[U_PAD:U_PAD + 1, :]], axis=0)
        ofregs_ref[:, :] = jnp.concatenate(
            [org, dirv, inv_dir, noid, min_dist, best_norm], axis=0)
        if instanced:
            oiregs_ref[:, :] = jnp.concatenate(
                [irot, iorg, idir, iinv, inoid,
                 iregs_ref[I_NOID + 3:I_ROWS, :]], axis=0)
        else:
            oiregs_ref[:, :] = iregs_ref[:, :]

    return kernel


@partial(jax.jit, static_argnames=('depth', 'instanced', 'block',
                                   'do_prune'))
def walk_iter(row_t, W, depth, instanced, sq, block=DEFAULT_BLOCK,
              do_prune=True):
    """One walker iteration over all lanes.

    ``row_t``: (ROW_WIDTH, n) u32 — transposed gathered rows.
    ``W``: walker-state dict (see ``seed``); returned updated, with
    ``W['uregs'][U_PTR]`` the next row to gather and ``U_ACT`` the
    live flag.
    """
    n = row_t.shape[1]
    b = min(block, n)
    grid = (n // b,)
    D = depth
    kern = _make_kernel(D, instanced, do_prune)

    def spec(rows_):
        return pl.BlockSpec((rows_, b), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    sq_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)

    shapes = dict(masks=(D * NMASK_WORDS, n), bases=(D, n),
                  tcodes=(D * BRANCH, n), uregs=(8, n), fregs=(16, n),
                  iregs=(I_ROWS, n))
    dtypes = dict(masks=jnp.uint32, bases=jnp.int32, tcodes=jnp.int32,
                  uregs=jnp.uint32, fregs=jnp.float32, iregs=jnp.float32)
    names = ('masks', 'bases', 'tcodes', 'uregs', 'fregs', 'iregs')

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[sq_spec, spec(ROW_WIDTH)]
        + [spec(shapes[k][0]) for k in names],
        out_specs=tuple(spec(shapes[k][0]) for k in names),
        out_shape=tuple(jax.ShapeDtypeStruct(shapes[k], dtypes[k])
                        for k in names),
        input_output_aliases={i + 2: i for i in range(len(names))},
        interpret=_interpret(),
    )(jnp.reshape(jnp.asarray(sq, jnp.float32), (1, 1)), row_t,
      *[W[k] for k in names])
    return dict(zip(names, out))


def seed(geom, depth, org_t, dir_t, lht, active):
    """Seed transposed walker state: root children slab-tested inline
    (the ops/mbvh.root_seed trick) AND the first pop done here, so the
    kernel never wastes an iteration on an empty 'process' phase.

    Args: org_t, dir_t (3, n) f32; lht (n,) i32; active (n,) bool.
    Returns the walker-state dict W.
    """
    n = org_t.shape[1]
    D = depth
    inv_t = 1.0 / dir_t
    noid_t = -org_t * inv_t

    masks = jnp.zeros((D * NMASK_WORDS, n), jnp.uint32)
    bases = jnp.zeros((D, n), jnp.int32)
    tcodes = jnp.full((D * BRANCH, n), 65535, jnp.int32)

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
        codes = jnp.where(b_ok,
                          jnp.clip(jnp.floor(tmin * sq), 0.0, 65535.0),
                          65535.0).astype(jnp.int32)
        # first pop: nearest root child, ties to lowest slot
        m = jnp.min(jnp.where(b_ok, codes, _BIG), axis=0, keepdims=True)
        c = jnp.min(jnp.where((codes == m) & b_ok, iota_slot, BRANCH),
                    axis=0, keepdims=True)                 # (1, n)
        act = jnp.any(b_ok, axis=0)                        # (n,)
        rem = b_ok & (iota_slot != c)
        words = []
        bit = (jnp.uint32(1) << jax.lax.broadcasted_iota(
            jnp.uint32, (32, n), 0))
        for w in range(NMASK_WORDS):
            words.append(jnp.sum(
                jnp.where(rem[w * 32:(w + 1) * 32, :], bit,
                          jnp.uint32(0)), axis=0, keepdims=True))
        masks = masks.at[1 * NMASK_WORDS:2 * NMASK_WORDS, :].set(
            jnp.concatenate(words, axis=0))
        tcodes = tcodes.at[1 * BRANCH:2 * BRANCH, :].set(codes)
        bases = bases.at[1:2, :].set(
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
    fregs = jnp.concatenate([
        org_t, dir_t, inv_t, noid_t,
        jnp.full((1, n), jnp.inf, jnp.float32),
        jnp.zeros((3, n), jnp.float32)], axis=0)
    iregs = jnp.zeros((I_ROWS, n), jnp.float32)
    if getattr(geom, 'mbvh_instanced', False):
        iregs = iregs.at[I_DIR:I_INV + 3, :].set(1.0)  # idir=iinv=1
    return dict(masks=masks, bases=bases, tcodes=tcodes, uregs=uregs,
                fregs=fregs, iregs=iregs)


def results(W):
    """Extract (triangle, distance, normal, material_code, pending)
    from walker state, standard (n,)/(n,3) layout."""
    return dict(
        triangle=_i32(W['uregs'][U_TRI]),
        distance=W['fregs'][F_MIN],
        normal=W['fregs'][F_NRM:F_NRM + 3].T,
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
