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

With BRANCH=28 a 300k-triangle detector is 4 levels deep and a typical
ray fetches ~8-12 rows per intersection instead of the ~105 node
records of a narrow BVH.  Construction reuses the Morton
recursive-grid coarsening of the reference builder (reference:
chroma/bvh/grid.py) but groups to a wide target degree and emits rows
directly.  All numpy, vectorized.
"""
import numpy as np

from chroma_tpu.bvh.build import create_leaf_nodes, _intra_run

BRANCH = 28                    # children per block / triangles per cluster
TARGET_DEGREE = 20             # Morton coarsening mean fan-out target

# row layout (u32 words)
HDR_KIND = 0                   # bit0: 1=cluster; bits 8..15: count
HDR_BASE = 1                   # internal: global row id of first child
BOX_OFF = 2                    # internal: BRANCH x (x,y,z) lo|hi<<16
VERT_OFF = 2                   # cluster: BRANCH x 9 f32 vertex words
TRI_ID_OFF = VERT_OFF + 9 * BRANCH          # cluster: BRANCH tri ids
MAT_OFF = TRI_ID_OFF + BRANCH               # cluster: BRANCH mat codes
ROW_WIDTH = MAT_OFF + BRANCH                # 312 words = 1248 B


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


def _coarsen_group(morton_codes, nnodes, target_degree):
    """One recursive-grid grouping round: coarsen codes until the mean
    fan-out reaches target_degree, then split runs > BRANCH.
    Returns (first_child, nchild, coarsened_codes)."""
    codes = morton_codes
    nunique = int((np.ediff1d(codes) > 0).sum()) + 1
    while nnodes / float(max(nunique, 1)) < target_degree and nunique > 1:
        codes = codes >> np.uint64(1)
        nunique = int((np.ediff1d(codes) > 0).sum()) + 1

    first_child = np.flatnonzero(
        np.ediff1d(codes, to_begin=np.uint64(1)) > 0).astype(np.int64)
    run_len = np.ediff1d(first_child, to_end=nnodes - first_child[-1])
    nsplit = -(-run_len // BRANCH)
    if (nsplit > 1).any():
        starts = np.repeat(first_child, nsplit)
        intra = _intra_run(nsplit)
        first_child = (starts + intra * BRANCH).astype(np.int64)
    nchild = np.ediff1d(first_child,
                        to_end=nnodes - first_child[-1]).astype(np.int64)
    return first_child, nchild, codes


def build_mbvh(mesh, material_codes=None, target_degree=TARGET_DEGREE):
    """Build an MBVH over ``mesh``.

    ``material_codes``: optional (T,) uint32 per-triangle packed
    material/surface codes baked into cluster rows (zeros if omitted).
    """
    tv_all = mesh.vertices[mesh.triangles].astype(np.float32)  # (T,3,3)
    ntris = len(mesh.triangles)
    if material_codes is None:
        material_codes = np.zeros(ntris, dtype=np.uint32)
    material_codes = np.asarray(material_codes, dtype=np.uint32)

    world_coords, leaves, morton = create_leaf_nodes(mesh)
    order = np.argsort(morton, kind='stable')
    morton = morton[order]
    tri_order = order.astype(np.int64)           # leaf i -> triangle id

    leaves_arr = leaves.view(np.uint32).reshape(-1, 4)[order]
    cur_lo = np.stack([leaves_arr[:, k] & 0xFFFF for k in range(3)], axis=1)
    cur_hi = np.stack([leaves_arr[:, k] >> 16 for k in range(3)], axis=1)

    # ---- grouping rounds (bottom-up) --------------------------------
    groupings = []          # (first_child, nchild) per round
    layer_lo, layer_hi = [], []
    n = ntris
    codes = morton
    while n > 1:
        first_child, nchild, codes_used = _coarsen_group(
            codes, n, target_degree)
        groupings.append((first_child, nchild))
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

    # ---- cluster rows ----------------------------------------------
    fc0, nc0 = groupings[0]
    crow = np.arange(nclusters)
    rows[id_base[0] + crow, HDR_KIND] = np.uint32(1) | (
        nc0.astype(np.uint32) << 8)
    slot = _intra_run(nc0)
    leaf_idx = np.repeat(fc0, nc0) + slot
    tri_ids = tri_order[leaf_idx]
    dst_row = id_base[0] + np.repeat(crow, nc0)
    verts = tv_all[tri_ids].reshape(-1, 9)
    vcols = VERT_OFF + slot[:, None] * 9 + np.arange(9)[None, :]
    rows[dst_row[:, None], vcols] = verts.view(np.uint32)
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
            rows[dst_rep, BOX_OFF + slot * 3 + ax] = \
                lo[:, ax] | (hi[:, ax] << 16)
        # empty slots: invalid box (lo=0xFFFF > hi=0) never hits
        empty = np.ones((nk, BRANCH), dtype=bool)
        empty[np.repeat(prow, nc), slot] = False
        erow, eslot = np.nonzero(empty)
        for ax in range(3):
            rows[id_base[k] + erow, BOX_OFF + eslot * 3 + ax] = 0xFFFF

    return MBVH(world_coords, rows, nblocks, nlayers, ntris)
