"""Wide (multi-branching) BVH for the TPU traversal engine.

The measured TPU cost model (ARCHITECTURE.md) says random gathers cost
a flat ~14 ns per ROW for any row width from 16 B to at least 1 KB —
so the traversal's currency is *rows fetched*, not bytes.  The MBVH
therefore packs the tree into self-contained fat rows of one uniform
width:

  * an *internal row* holds up to BRANCH quantized child AABBs plus
    the global id of the first child row (children are consecutive);
  * a *cluster row* holds up to BRANCH fully-assembled triangles
    (vertices, triangle ids, material codes) ready for direct
    Moller-Trumbore testing — leaf AABBs are skipped entirely.

With BRANCH=128 the 42M-triangle full demo is 4 levels deep and a
typical ray fetches ~11 rows per intersection (measured, round 2)
instead of the ~105 node records of a narrow BVH; BRANCH and
TARGET_DEGREE are env-overridable (CHROMA_TPU_BRANCH /
CHROMA_TPU_TARGET_DEGREE) for build experiments.  Construction reuses the Morton
recursive-grid coarsening of the reference builder (reference:
chroma/bvh/grid.py) but groups to a wide target degree and emits rows
directly.  All numpy, vectorized.
"""
import numpy as np

from chroma_tpu.bvh.build import create_leaf_nodes, _intra_run

import os

BRANCH = int(os.environ.get('CHROMA_TPU_BRANCH', 128))
                               # children per block / triangles per cluster
NMASK_WORDS = BRANCH // 32     # u32 words per pending-children bitmask
TARGET_DEGREE = int(os.environ.get('CHROMA_TPU_TARGET_DEGREE',
                                   BRANCH * 3 // 4))
                               # Morton coarsening mean fan-out target

# row layout (u32 words).  Cluster triangle vertices are quantized to
# u16 on a per-cluster local grid (origin + per-axis scale).  BRANCH
# is 128 because (a) fat-row gathers are latency-bound — a 3.4 KB row
# costs ~1.3x a 760 B row while carrying 4.6x the content (measured,
# tools/profile_step.py section E) — and (b) the TPU vector unit is
# 128 lanes wide, so (N, BRANCH) slot math fills every lane (at the
# r1 BRANCH=28, 78% of each vector row was padding).  Wider rows also
# halve tree depth, and traversal iterations cost ~126 us each in
# fixed overhead regardless of batch width.
HDR_KIND = 0                   # bit0: 1=cluster; bits 8..15: count
HDR_BASE = 1                   # internal: global row id of first child
BOX_OFF = 2                    # internal: component-major, axis k's
                               # BRANCH lo|hi<<16 words at BOX_OFF+k*BRANCH
QORIGIN_OFF = 2                # cluster: 3 x f32 local origin
QSCALE_OFF = 5                 # cluster: 3 x f32 local scale
QVERT_OFF = 8                  # cluster: 9 components x BRANCH u16,
QVERT_WORDS_PER_COMP = BRANCH // 2          # component-major u16 pairs
TRI_ID_OFF = QVERT_OFF + 9 * QVERT_WORDS_PER_COMP  # BRANCH tri ids
MAT_OFF = TRI_ID_OFF + BRANCH               # BRANCH mat codes
ROW_WIDTH = MAT_OFF + BRANCH                # 840 words = 3360 B at BRANCH=128
LAYOUT_VERSION = 5
assert BRANCH % 2 == 0


class MBVH(object):
    """Packed wide BVH: uniform (R, ROW_WIDTH) u32 rows, root row 0."""

    def __init__(self, world_coords, rows, nblocks, depth, ntriangles):
        self.world_coords = world_coords
        self.rows = rows
        self.nblocks = nblocks
        self.depth = depth
        self.ntriangles = ntriangles

    def __len__(self):
        return len(self.rows)


def _coarsen_group(morton_codes, nnodes, target_degree, branch=None):
    """One recursive-grid grouping round: coarsen codes until the mean
    fan-out reaches target_degree, then split runs > ``branch``
    (default BRANCH).  Returns (first_child, nchild, coarsened_codes)."""
    if branch is None:
        branch = BRANCH
    codes = morton_codes
    nunique = int((np.ediff1d(codes) > 0).sum()) + 1
    while nnodes / float(max(nunique, 1)) < target_degree and nunique > 1:
        codes = codes >> np.uint64(1)
        nunique = int((np.ediff1d(codes) > 0).sum()) + 1

    first_child = np.flatnonzero(
        np.ediff1d(codes, to_begin=np.uint64(1)) > 0).astype(np.int64)
    run_len = np.ediff1d(first_child, to_end=nnodes - first_child[-1])
    nsplit = -(-run_len // branch)
    if (nsplit > 1).any():
        starts = np.repeat(first_child, nsplit)
        intra = _intra_run(nsplit)
        first_child = (starts + intra * branch).astype(np.int64)
    nchild = np.ediff1d(first_child,
                        to_end=nnodes - first_child[-1]).astype(np.int64)
    return first_child, nchild, codes


def _leaf_data(mesh):
    """(world_coords, lo (T,3) u32, hi (T,3) u32, morton (T,) u64),
    preferring the native C++ helper (csrc/chroma_native.cc)."""
    from chroma_tpu.bvh.bvh import WorldCoords
    from chroma_tpu import native

    vertices = mesh.vertices
    world_origin = vertices.min(axis=0)
    world_scale = float(np.max(vertices.max(axis=0) - world_origin)
                        / (2 ** 16 - 2))
    wc = WorldCoords(world_origin=world_origin, world_scale=world_scale)

    nat = native.quantize_and_morton(vertices, mesh.triangles,
                                     world_origin, world_scale)
    if nat is not None:
        lo, hi, morton = nat
        return wc, lo, hi, morton

    # numpy fallback (same math as create_leaf_nodes, unpacked)
    tv = vertices[mesh.triangles]
    lower = tv.min(axis=1)
    upper = tv.max(axis=1)
    centroid = tv.mean(axis=1)

    def quantize(v):
        return ((v - world_origin) / world_scale).astype(np.uint32)

    lo = quantize(lower)
    lo[lo > 0] -= 1
    hi = quantize(upper) + 1
    from chroma_tpu.bvh.build import morton_codes_3d
    morton = morton_codes_3d(quantize(centroid))
    return wc, lo, hi, morton


def build_mbvh(mesh, material_codes=None, target_degree=TARGET_DEGREE):
    """Build an MBVH over ``mesh``.

    ``material_codes``: optional (T,) uint32 per-triangle packed
    material/surface codes baked into cluster rows (zeros if omitted).
    """
    from chroma_tpu import native

    tv_all = mesh.vertices[mesh.triangles].astype(np.float32)  # (T,3,3)
    ntris = len(mesh.triangles)
    if material_codes is None:
        material_codes = np.zeros(ntris, dtype=np.uint32)
    material_codes = np.asarray(material_codes, dtype=np.uint32)

    world_coords, cur_lo, cur_hi, morton = _leaf_data(mesh)
    order = native.radix_argsort_u64(morton)
    if order is None:
        order = np.argsort(morton, kind='stable')
    morton = morton[order]
    tri_order = order.astype(np.int64)           # leaf i -> triangle id
    cur_lo = cur_lo[order]
    cur_hi = cur_hi[order]

    # ---- grouping rounds (bottom-up) --------------------------------
    groupings = []          # (first_child, nchild) per round
    layer_lo, layer_hi = [], []
    n = ntris
    codes = morton
    while n > 1:
        nat = native.coarsen_group(codes, target_degree, BRANCH)
        if nat is not None:
            first_child, codes_used = nat
            nchild = np.ediff1d(first_child,
                                to_end=n - first_child[-1]).astype(np.int64)
        else:
            first_child, nchild, codes_used = _coarsen_group(
                codes, n, target_degree)
        groupings.append((first_child, nchild))
        seg = native.segment_min_max(cur_lo, cur_hi, first_child, nchild)
        if seg is not None:
            cur_lo, cur_hi = seg
        else:
            cur_lo = np.minimum.reduceat(cur_lo, first_child, axis=0)
            cur_hi = np.maximum.reduceat(cur_hi, first_child, axis=0)
        layer_lo.append(cur_lo)
        layer_hi.append(cur_hi)
        codes = codes_used[first_child]
        n = len(first_child)
    if not groupings:
        groupings.append((np.array([0], dtype=np.int64),
                          np.array([ntris], dtype=np.int64)))
        layer_lo.append(cur_lo[:1])
        layer_hi.append(cur_hi[:1])

    # layers, bottom-up: layer 0 = clusters, layer k>0 = internal.
    nlayers = len(groupings)
    layer_sizes = [len(g[0]) for g in groupings]

    # global row ids: internal rows top-down layer by layer, clusters
    # last — root is always row 0.
    nclusters = layer_sizes[0]
    nblocks = sum(layer_sizes[1:]) if nlayers > 1 else 0
    id_base = {}
    running = 0
    for k in range(nlayers - 1, 0, -1):
        id_base[k] = running
        running += layer_sizes[k]
    id_base[0] = running
    assert running == nblocks

    rows = np.zeros((nblocks + nclusters, ROW_WIDTH), dtype=np.uint32)

    # ---- cluster rows (quantized component-major vertices) ----------
    fc0, nc0 = groupings[0]
    crow = np.arange(nclusters)
    cdst = id_base[0] + crow
    rows[cdst, HDR_KIND] = np.uint32(1) | (nc0.astype(np.uint32) << 8)
    slot = _intra_run(nc0)
    leaf_idx = np.repeat(fc0, nc0) + slot
    tri_ids = tri_order[leaf_idx]
    dst_row = id_base[0] + np.repeat(crow, nc0)
    verts = tv_all[tri_ids]                              # (T,3,3)

    # per-cluster local grid
    cl_min = np.minimum.reduceat(verts.min(axis=1), fc0, axis=0)
    cl_max = np.maximum.reduceat(verts.max(axis=1), fc0, axis=0)
    scale = np.maximum((cl_max - cl_min) / 65535.0, 1e-12) \
        .astype(np.float32)
    origin = cl_min.astype(np.float32)
    rows[cdst[:, None], QORIGIN_OFF + np.arange(3)[None, :]] = \
        origin.view(np.uint32)
    rows[cdst[:, None], QSCALE_OFF + np.arange(3)[None, :]] = \
        scale.view(np.uint32)

    crep = np.repeat(crow, nc0)
    q = np.clip(np.round(
        (verts - origin[crep][:, None, :]) / scale[crep][:, None, :]),
        0, 65535).astype(np.uint32)                      # (T,3,3)
    padded = np.zeros((nclusters, BRANCH, 9), dtype=np.uint32)
    padded[crep, slot, :] = q.reshape(-1, 9)
    # block halfword layout: word w holds slots (w, w + BRANCH/2) so
    # the walker unpacks with a concat instead of a lane interleave
    half = BRANCH // 2
    packed = padded[:, :half, :] | (padded[:, half:, :] << 16)  # (C,14,9)
    rows[cdst[:, None],
         QVERT_OFF + np.arange(9 * QVERT_WORDS_PER_COMP)[None, :]] = \
        packed.transpose(0, 2, 1).reshape(nclusters, -1)

    rows[dst_row, TRI_ID_OFF + slot] = tri_ids.astype(np.uint32)
    rows[dst_row, MAT_OFF + slot] = material_codes[tri_ids]

    # ---- internal rows ---------------------------------------------
    for k in range(1, nlayers):
        fc, nc = groupings[k]
        nk = len(fc)
        prow = np.arange(nk)
        dst = id_base[k] + prow
        rows[dst, HDR_KIND] = (nc.astype(np.uint32) << 8)
        rows[dst, HDR_BASE] = (id_base[k - 1] + fc).astype(np.uint32)
        slot = _intra_run(nc)
        child = np.repeat(fc, nc) + slot
        dst_rep = id_base[k] + np.repeat(prow, nc)
        lo = layer_lo[k - 1][child]
        hi = layer_hi[k - 1][child]
        for ax in range(3):
            rows[dst_rep, BOX_OFF + ax * BRANCH + slot] = \
                lo[:, ax] | (hi[:, ax] << 16)
        # empty slots: invalid box (lo=0xFFFF > hi=0) never hits
        empty = np.ones((nk, BRANCH), dtype=bool)
        empty[np.repeat(prow, nc), slot] = False
        erow, eslot = np.nonzero(empty)
        for ax in range(3):
            rows[id_base[k] + erow, BOX_OFF + ax * BRANCH + eslot] = 0xFFFF

    return MBVH(world_coords, rows, nblocks, nlayers, ntris)
