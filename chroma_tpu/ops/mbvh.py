"""Lock-step MBVH traversal: one fat-row gather per step.

This is the production traversal of the engine (the narrow escape-rope
walker in chroma_tpu/ops/mesh.py is the validation fallback).  Per-ray
state is a bitmask path: for each tree level, a pending-children
bitmask and the first-child row id (children are consecutive, so the
c-th pending child lives at base + c).  Every iteration:

  1. find the deepest level with pending work (predicated scan over a
     static depth — no ascend iterations, no stacks, no scatters);
  2. pop the lowest pending bit, gather that child's row (the ONLY
     gather of the step — everything else is VPU);
  3. cluster rows: Moller-Trumbore all BRANCH pre-assembled triangles,
     keep the closest (plus its geometric normal and material code so
     the physics step needs no further triangle fetches);
  4. internal rows: slab-test all BRANCH child AABBs (pruned against
     the best hit) and push the hit mask one level deeper.

All per-slot reductions use one-hot selects — fancy `[lane, idx]`
indexing is an XLA gather in disguise and costs as much as an HBM row
fetch (ARCHITECTURE.md).

The reference equivalent is the per-thread stack walk of
chroma/cuda/mesh.h:41 — re-engineered wholesale for a vector machine.
"""
from functools import partial

import jax
import jax.numpy as jnp

from chroma_tpu.bvh.mbvh import (ROW_WIDTH, HDR_KIND, HDR_BASE, BOX_OFF,
                                 QORIGIN_OFF, QSCALE_OFF, QVERT_OFF,
                                 QVERT_WORDS_PER_COMP, TRI_ID_OFF,
                                 MAT_OFF, BRANCH)

MAX_LEVELS = 12


@partial(jax.jit, static_argnames=('max_iters',))
def intersect_mesh(origin, direction, geom, last_hit_triangle=None,
                   active=None, max_iters=65536):
    """Closest-hit intersection against the MBVH.

    Args:
      origin, direction: (N,3) f32, direction normalized.
      geom: GeometryTables (with mbvh_rows).
      last_hit_triangle: (N,) i32 triangle to skip, or None.

    Returns dict with:
      triangle: (N,) i32 (-1 = miss)
      distance: (N,) f32 (inf on miss)
      normal:   (N,3) f32 geometric normal (unnormalized cross product)
      material_code: (N,) u32 packed material/surface code
    """
    n = origin.shape[0]
    if last_hit_triangle is None:
        last_hit_triangle = jnp.full(n, -1, jnp.int32)

    rows = geom.mbvh_rows
    depth = min(geom.mbvh_depth + 1, MAX_LEVELS)

    inv_dir = 1.0 / direction
    neg_origin_inv_dir = -origin * inv_dir

    iota_d = jnp.arange(depth, dtype=jnp.int32)
    slots = jnp.arange(BRANCH, dtype=jnp.int32)

    # rays with active=False never start traversing: they gather row 0
    # every iteration (coherent, cheap) and return a miss — essential
    # when most of a propagating batch has already terminated
    start = jnp.uint32(1) if active is None \
        else active.astype(jnp.uint32)
    masks0 = jnp.zeros((n, depth), jnp.uint32).at[:, 0].set(start)
    state = dict(
        masks=masks0,
        bases=jnp.zeros((n, depth), jnp.uint32),
        best_tri=jnp.full(n, -1, jnp.int32),
        min_dist=jnp.full(n, jnp.inf, jnp.float32),
        best_norm=jnp.zeros((n, 3), jnp.float32),
        best_mat=jnp.zeros(n, jnp.uint32),
        iters=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return jnp.any(s['masks'] != 0) & (s['iters'] < max_iters)

    def body(s):
        masks, bases = s['masks'], s['bases']

        # deepest level with pending children (predicated scan)
        pending = masks != 0
        active = jnp.any(pending, axis=1)
        lvl = jnp.max(jnp.where(pending, iota_d[None, :], -1), axis=1)
        onehot = iota_d[None, :] == lvl[:, None]

        mask_l = jnp.sum(jnp.where(onehot, masks, 0), axis=1)
        base_l = jnp.sum(jnp.where(onehot, bases, 0), axis=1)

        low = mask_l & (~mask_l + jnp.uint32(1))    # lowest set bit
        c = jax.lax.population_count(low - jnp.uint32(1))
        masks = jnp.where(onehot & active[:, None], masks ^ low[:, None],
                          masks)

        ptr = jnp.where(active, base_l + c, 0)
        row = rows[ptr]                         # THE gather, (N, ROW_WIDTH)

        kind = row[:, HDR_KIND] & jnp.uint32(1)
        count = (row[:, HDR_KIND] >> jnp.uint32(8)).astype(jnp.int32)
        is_cluster = active & (kind == 1)
        is_internal = active & (kind == 0)

        # ---- cluster: Moller-Trumbore on component-wise (N,BRANCH)
        # slices of the quantized component-major vertex block — never
        # materializing (N,BRANCH,3,3) keeps the loop body's HBM
        # intermediate traffic down ----------------------------------
        qorigin = [jax.lax.bitcast_convert_type(
            row[:, QORIGIN_OFF + k], jnp.float32)[:, None]
            for k in range(3)]
        qscale = [jax.lax.bitcast_convert_type(
            row[:, QSCALE_OFF + k], jnp.float32)[:, None]
            for k in range(3)]

        def vcomp(j):
            w = row[:, QVERT_OFF + j * QVERT_WORDS_PER_COMP:
                    QVERT_OFF + (j + 1) * QVERT_WORDS_PER_COMP]
            lo = (w & jnp.uint32(0xFFFF)).astype(jnp.float32)
            hi = (w >> jnp.uint32(16)).astype(jnp.float32)
            # block halfword layout: slots [0..B/2) in lo, rest in hi
            q = jnp.concatenate([lo, hi], axis=1)
            k = j % 3
            return q * qscale[k] + qorigin[k]

        v0 = [vcomp(j) for j in range(3)]
        v1 = [vcomp(j) for j in range(3, 6)]
        v2 = [vcomp(j) for j in range(6, 9)]
        d = [direction[:, k:k + 1] for k in range(3)]
        o = [origin[:, k:k + 1] for k in range(3)]
        e1 = [v1[k] - v0[k] for k in range(3)]
        e2 = [v2[k] - v0[k] for k in range(3)]

        def cross3(a, b):
            return [a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0]]

        def dot3(a, b):
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        h = cross3(d, e2)
        a = dot3(e1, h)
        not_par = jnp.abs(a) > 1.1920929e-07
        f = 1.0 / jnp.where(not_par, a, 1.0)
        sv = [o[k] - v0[k] for k in range(3)]
        u_b = f * dot3(sv, h)
        q = cross3(sv, e1)
        v_b = f * dot3(d, q)
        t_d = f * dot3(e2, q)
        eps = 1e-6
        t_hit = (not_par & (u_b >= -eps) & (u_b <= 1.0 + eps)
                 & (v_b >= -eps) & (u_b + v_b <= 1.0 + eps) & (t_d > eps))

        tri_ids = row[:, TRI_ID_OFF:TRI_ID_OFF + BRANCH].astype(jnp.int32)
        valid = (t_hit & (slots[None, :] < count[:, None])
                 & (tri_ids != last_hit_triangle[:, None]))
        t_dist = jnp.where(valid, t_d, jnp.inf)
        cl_dist = jnp.min(t_dist, axis=1)
        # one-hot of the FIRST minimal slot (ties broken like argmin)
        is_min = t_dist == cl_dist[:, None]
        oh_slot = is_min & (jnp.cumsum(is_min, axis=1) == 1)

        improved = is_cluster & (cl_dist < s['min_dist'])
        norm_c = cross3(e1, e2)

        def pick(arr):
            return jnp.sum(jnp.where(oh_slot, arr, 0), axis=1)

        def pickf(arr):
            return jnp.sum(jnp.where(oh_slot, arr, 0.0), axis=1)

        best_tri = jnp.where(improved, pick(tri_ids), s['best_tri'])
        min_dist = jnp.where(improved, cl_dist, s['min_dist'])
        norm_new = jnp.stack([pickf(norm_c[0]), pickf(norm_c[1]),
                              pickf(norm_c[2])], axis=-1)
        best_norm = jnp.where(improved[:, None], norm_new, s['best_norm'])
        mats = row[:, MAT_OFF:MAT_OFF + BRANCH]
        best_mat = jnp.where(improved,
                             pick(mats.astype(jnp.int32)).astype(jnp.uint32),
                             s['best_mat'])

        # ---- internal: slab-test all child boxes, component-wise ----
        tmin = None
        tmax = None
        ws = geom.world_scale
        for k in range(3):
            pk = row[:, BOX_OFF + k:BOX_OFF + 3 * BRANCH:3]
            lok = geom.world_origin[k] \
                + (pk & jnp.uint32(0xFFFF)).astype(jnp.float32) * ws
            hik = geom.world_origin[k] \
                + (pk >> jnp.uint32(16)).astype(jnp.float32) * ws
            t0 = lok * inv_dir[:, k:k + 1] + neg_origin_inv_dir[:, k:k + 1]
            t1 = hik * inv_dir[:, k:k + 1] + neg_origin_inv_dir[:, k:k + 1]
            finite = jnp.isfinite(inv_dir[:, k:k + 1])
            small = jnp.where(finite, jnp.minimum(t0, t1), -jnp.inf)
            big = jnp.where(finite, jnp.maximum(t0, t1), jnp.inf)
            tmin = small if tmin is None else jnp.maximum(tmin, small)
            tmax = big if tmax is None else jnp.minimum(tmax, big)
        tmin = jnp.maximum(tmin, 0.0)
        b_ok = (tmin <= tmax) & (tmin <= min_dist[:, None]) \
            & (slots[None, :] < count[:, None])
        hitmask = jnp.sum(
            jnp.where(b_ok,
                      jnp.uint32(1) << slots[None, :].astype(jnp.uint32),
                      jnp.uint32(0)), axis=1).astype(jnp.uint32)

        push = is_internal & (hitmask != 0) & (lvl + 1 < depth)
        onehot_child = iota_d[None, :] == (lvl + 1)[:, None]
        masks = jnp.where(onehot_child & push[:, None], hitmask[:, None],
                          masks)
        bases = jnp.where(onehot_child & push[:, None],
                          row[:, HDR_BASE][:, None], bases)

        return dict(masks=masks, bases=bases, best_tri=best_tri,
                    min_dist=min_dist, best_norm=best_norm,
                    best_mat=best_mat, iters=s['iters'] + 1)

    out = jax.lax.while_loop(cond, body, state)
    # rays stopped by max_iters still have pending work: their partial
    # result must not be trusted (callers retry them)
    incomplete = jnp.any(out['masks'] != 0, axis=1)
    return dict(triangle=out['best_tri'], distance=out['min_dist'],
                normal=out['best_norm'], material_code=out['best_mat'],
                incomplete=incomplete)
