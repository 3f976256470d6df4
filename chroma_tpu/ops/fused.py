"""Fused propagation: traversal iterations + physics in ONE device loop.

The round-2 profile (ARCHITECTURE.md) shows the engine's currency is
MBVH row gathers, every loop iteration costs the full lane width, and
host round-trips cost ~26 ms each on this tunneled platform.  The
compacting driver (ops/photon.py propagate_compacting) already shrinks
the working width as photons die, but it still pays

  * one host sync + repartition per round,
  * a full traversal-cascade tail per step (lanes that found their hit
    idle while stragglers walk), and
  * per-iteration fixed costs on narrow trickle stages.

This module removes all three by running a *megakernel* analog: every
lane owns one in-flight photon; each loop iteration advances every
lane's BVH walk by one row; every ``SERVICE_EVERY`` iterations a
predicated physics pass (ops/propagate.physics_update) advances the
lanes whose traversal completed, retires terminated photons to the
result pool, and refills their lanes with waiting photons.  No lane
ever idles while work remains — the lock-step tail only appears when
the pool runs dry, and a two-stage lane-compaction cascade (same trick
as ops/mbvh.py) shrinks the width for that drain.

The reference equivalent is the persistent-thread propagate kernel +
double-buffered queues (chroma/cuda/propagate.cu:217,
chroma/gpu/photon.py:192) — re-engineered for a vector machine.

Software pipelining (round 3): the row gather and the VPU math of one
walker iteration form a strict dependence chain (pop -> gather -> test
-> push -> pop), so a single lock-step batch leaves the HBM fetch and
the vector unit idle in alternation.  Measured on-chip, an XLA row
gather overlaps fully with INDEPENDENT elementwise work (C ~ max(A,B)
in the gather/VPU chained-loop probe), so the driver runs ``CHAINS``
independent lane batches inside the same device loop: chain A's row
fetch rides under chain B's triangle tests.  Each chain owns a private
segment of the photon pool, so the chains share nothing but the jit.

RNG note: draws are consumed per *service pass*, not per photon step,
so sequences differ from ops/photon.propagate — all physics tests are
statistical, and both drivers sample the same distributions.
"""
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from chroma_tpu import event
from chroma_tpu.ops import mbvh
from chroma_tpu.ops import mbvh_pallas as MP
from chroma_tpu.ops.mbvh import NMASK_WORDS
from chroma_tpu.ops.propagate import physics_update, NDRAWS


def _use_pallas_default():
    """The Pallas walker is the production traversal on real TPUs; the
    jnp walker remains the portable path (CPU backend, virtual
    meshes — pallas interpret mode is far too slow for them).
    CHROMA_TPU_PALLAS=0/1 overrides."""
    env = os.environ.get('CHROMA_TPU_PALLAS')
    if env is not None:
        return env != '0'
    return jax.default_backend() == 'tpu'

# Walker iterations between physics passes.  With the ondeck
# drain-restart a drained lane no longer idles out the window (util
# 0.59 -> ~0.75-0.90), so the window stretches until on-deck-slot
# exhaustion: r4 sweep on the full demo peaks at se=17 (2.41M vs 2.17M
# at the r3 se=10; tools/tune_ondeck.py + ARCHITECTURE.md).  Env knob:
# the service window is UNROLLED in the jitted driver, so compile time
# grows with it — the CPU test suite pins a smaller value (conftest).
SERVICE_EVERY = int(os.environ.get('CHROMA_TPU_SERVICE_EVERY', 17))
DEFAULT_WIDTH = 12288   # total lane width across chains: 3 chains of
                        # 4096 (r3, merged service pass) edge out 2 of
                        # 4096 at w=8192 — the third chain's gathers
                        # hide under the others' kernels while the
                        # merged service keeps its base cost shared
                        # (tools/tune_chains: 2.29M vs 2.26M; C=3 at
                        # w=8192, i.e. 2731-lane chains, loses: 2.02M)
DEFAULT_CHAINS = int(os.environ.get('CHROMA_TPU_CHAINS', 3))
MIN_CHAIN_WIDTH = 2048  # below this, pipelining overhead beats the
                        # overlap win: fall back to one chain
DRAIN_SHRINK = (8, 64)  # lane-compaction cascade for the pool-dry tail

_PHOTON_KEYS = ('pos', 'dir', 'pol', 'wavelength', 't', 'weight',
                'flags', 'last_hit_triangle', 'evidx', 'index')
_WALK_RESET = ('best_tri', 'min_dist', 'best_norm', 'best_mat')
# pallas-walker state keys: transposed (rows, lanes) arrays
_W_KEYS = tuple('W_' + k for k in MP.W_KEYS)
_W_KEYS_OD = tuple('W_' + k for k in MP.OD_W_KEYS)


def _pack(state):
    """Photon SoA -> (n, 16) u32 rows (float fields bitcast), so pool
    writeback + refill are ONE scatter + ONE gather instead of ten of
    each.  Word layout: pos[3] dir[3] pol[3] wavelength t weight
    flags lht evidx index.

    The rows are UNSIGNED INT, not float: flag words bitcast into f32
    are denormals/NaNs, and XLA:TPU is free to flush or canonicalize
    those inside fusions it builds around a float-typed value (seen in
    practice: history flag bits zeroed at some lane widths but not
    others).  Integer words are bit-exact under every select / gather /
    scatter, so the floats ride as bit patterns instead."""
    u32 = lambda v: jax.lax.bitcast_convert_type(v, jnp.uint32)
    return jnp.concatenate([
        u32(state['pos']), u32(state['dir']), u32(state['pol']),
        u32(state['wavelength'])[:, None], u32(state['t'])[:, None],
        u32(state['weight'])[:, None], state['flags'][:, None],
        u32(state['last_hit_triangle'])[:, None],
        state['evidx'].astype(jnp.uint32)[:, None],
        state['index'].astype(jnp.uint32)[:, None]], axis=1)


def _unpack(arr):
    f32 = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
    i32 = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)
    return dict(pos=f32(arr[:, 0:3]), dir=f32(arr[:, 3:6]),
                pol=f32(arr[:, 6:9]), wavelength=f32(arr[:, 9]),
                t=f32(arr[:, 10]), weight=f32(arr[:, 11]),
                flags=arr[:, 12], last_hit_triangle=i32(arr[:, 13]),
                evidx=arr[:, 14], index=arr[:, 15])


def _reseed(lane, need, geom):
    """Restart the BVH walk for lanes in ``need`` (root children
    slab-tested inline — mbvh.root_seed — so the walk starts at level
    1); refresh the ray-derived walker fields from the photon state."""
    depth = lane['masks'].shape[1]
    inv_dir = 1.0 / lane['dir']
    noid = -lane['pos'] * inv_dir
    smasks, sbases, stcodes = mbvh.root_seed(geom, depth, inv_dir, noid,
                                             need)
    masks = jnp.where(need[:, None, None], smasks, lane['masks'])
    out = dict(lane)
    out.update(
        org=jnp.where(need[:, None], lane['pos'], lane['org']),
        masks=masks,
        bases=jnp.where(need[:, None], sbases, lane['bases']),
        tcodes=jnp.where(need[:, None, None], stcodes, lane['tcodes']),
        best_tri=jnp.where(need, -1, lane['best_tri']),
        min_dist=jnp.where(need, jnp.inf, lane['min_dist']),
        best_norm=jnp.where(need[:, None], 0.0, lane['best_norm']),
        best_mat=jnp.where(need, jnp.uint32(0), lane['best_mat']),
        inv_dir=jnp.where(need[:, None], inv_dir, lane['inv_dir']),
        noid=jnp.where(need[:, None], noid, lane['noid']),
        lht=jnp.where(need, lane['last_hit_triangle'], lane['lht']),
    )
    return out


def _reseed_pallas(lane, need, geom):
    """Pallas-mode _reseed: restart the walk (root children slab-tested
    + first child popped inline in MP.seed) for lanes in ``need``."""
    depth = int(geom.mbvh_depth)
    W2 = MP.seed(geom, depth, lane['pos'].T, lane['dir'].T,
                 lane['last_hit_triangle'], need)
    out = dict(lane)
    nd = need[None, :]
    for k in _W_KEYS:
        out[k] = jnp.where(nd, W2[k[2:]], lane[k])
    return out


def _pallas_results(lane):
    """Traversal results for the service pass, pallas-mode lanes."""
    W = {k[2:]: lane[k] for k in _W_KEYS}
    r = MP.results(W)
    w = lane['pos'].shape[0]
    return dict(triangle=r['triangle'], distance=r['distance'],
                normal=r['normal'], material_code=r['material_code'],
                incomplete=jnp.zeros(w, bool))


def _service_ondeck_v2(lanes, pool, next_ptr, keys, geom, max_steps,
                       scatter_first, use_weights, seg_lo, seg_sizes):
    """Ondeck-mode service pass, chain-batched (round-4 EXPERIMENT —
    measured LOSS, kept behind CHROMA_TPU_ONDECK_V2=1).

    The round-3 per-chain service (``_service_ondeck``, the production
    default) costs ~2.9 ms/pass of which ~2.15 ms is slot/pool
    plumbing — per-op FIXED costs, not bytes
    (tools/profile_service4.py ablations).  This version collapses the
    op count, but end-to-end it LOSES on the full demo (2.02M vs
    2.09M photons/s at the default w=12288 C=3 config): batching all
    chains' slot logic behind jnp.stack/concat joins makes the service
    a cross-chain sync point, defeating exactly the pipelining overlap
    the chains exist for.  Verified bit-identical to v1 (same key) on
    TPU before the comparison.

      * lanes store the photon as ONE packed (w, 16) array (``packed``,
        see _pack) instead of ten SoA keys — every slot move is one
        ``where`` instead of ten;
      * all chains' slot logic runs batched over a leading (C, w) chain
        axis (chain widths are always equal by construction), with one
        global photon pool and a (C,) ``next_ptr`` vector — retire is
        ONE scatter for every chain and both photon sets;
      * the traversal reseed (MP.seed) and on-deck seeding (MP.od_seed)
        run ONCE over the lane-concatenated walker state.

    Semantics and RNG consumption are identical to v1 (bit-equal
    output for the same key).

    Each lane has two photon slots: WALKING (live walker registers)
    and ON-DECK (packed in ``odk_packed``).  The kernel's drain-restart
    swap (mbvh_pallas._make_kernel ondeck) moves the on-deck photon
    into the walking registers mid-window, parking the finished walk's
    results — the lane's ``packed`` photon then lags one photon behind
    until this pass reconciles:

      parked bit set   -> ``packed`` = parked photon A (results in
                          W_park); walking photon = odk_packed
      parked bit clear -> ``packed`` = walking photon; on-deck photon
                          (if any) unconsumed in odk_packed

    After physics, a continuing parked photon or an unconsumed on-deck
    photon (mutually exclusive — the swap consumes the on-deck slot
    when it parks) becomes the new walking photon if that slot freed,
    else goes (back) on deck; empty slots refill from the chain's pool
    segment (walking slot first, then on-deck)."""
    C = len(lanes)
    w = lanes[0]['holding'].shape[0]   # chain widths are always equal
    Cw = C * w
    n_pool = pool.shape[0]
    TERM = jnp.uint32(event.TERMINAL_FLAGS)
    key0, sk = jax.random.split(keys[0])
    keys = [key0] + list(keys[1:])
    u = jax.random.uniform(sk, (2 * Cw, NDRAWS), dtype=jnp.float32)

    def stk(k):
        return jnp.stack([ln[k] for ln in lanes], axis=0)  # (C, w, ...)

    packed = stk('packed')
    odk_packed = stk('odk_packed')
    step = stk('step')
    odk_step = stk('odk_step')
    odk_live = stk('odk_live')
    holding = stk('holding')

    # ---- walker results, lane-concatenated (chain-major) -------------
    Wcat = {k: jnp.concatenate([ln['W_' + k] for ln in lanes], axis=1)
            for k in ('uregs', 'hregs', 'park')}
    pr = MP.park_results(Wcat)
    parked = pr.pop('parked')                              # (Cw,)
    rl = MP.results(Wcat)
    rl.pop('incomplete')
    act = Wcat['uregs'][MP.U_ACT] != 0
    RES = {k: jnp.concatenate([pr[k], rl[k]], axis=0) for k in rl}
    RES['incomplete'] = jnp.zeros(2 * Cw, bool)

    # ---- one merged, fully predicated physics pass --------------------
    flatP = packed.reshape(Cw, 16)
    flatW = jnp.where(parked[:, None], odk_packed.reshape(Cw, 16), flatP)
    BIG = _unpack(jnp.concatenate([flatP, flatW], axis=0))
    stepP = step.reshape(Cw)
    stepW = jnp.where(parked, odk_step.reshape(Cw), stepP)
    step2 = jnp.concatenate([stepP, stepW])
    holdf = holding.reshape(Cw)

    aliveB = (BIG['flags'] & TERM) == 0
    bad = jnp.isnan(jnp.sum(BIG['dir'], axis=1)
                    + jnp.sum(BIG['pos'], axis=1))
    ready = (jnp.concatenate([parked, holdf & ~act])
             & aliveB & (step2 < max_steps))
    nan_mask = ready & bad
    flags = jnp.where(nan_mask,
                      BIG['flags']
                      | jnp.uint32(event.NO_HIT | event.NAN_ABORT),
                      BIG['flags'])
    active = ready & ~bad
    sf = jnp.where(step2 == 0, scatter_first, 0)
    new_state = physics_update(BIG, RES, geom, u, flags, active,
                               nan_mask, sf, use_weights=use_weights)
    BIG.update(new_state)
    step2 = step2 + ready.astype(jnp.int32)
    BIG2 = _pack(BIG)                                      # (2Cw, 16)

    # ---- retire: ONE scatter for both sets, all chains ---------------
    term2 = (BIG['flags'] & TERM) != 0
    termA, termW = term2[:Cw], term2[Cw:]
    stepA2, stepW2 = step2[:Cw], step2[Cw:]
    doneL = holdf & ~act
    finishedA = parked & (termA | (stepA2 >= max_steps))
    finishedW = doneL & (termW | (stepW2 >= max_steps))
    contA = parked & ~finishedA
    contW = doneL & ~finishedW
    out_idx = jnp.where(jnp.concatenate([finishedA, finishedW]),
                        BIG['index'].astype(jnp.int32), n_pool)
    pool = pool.at[out_idx].set(BIG2, mode='drop')

    # ---- slot redistribution, (C, w)-batched --------------------------
    packedA = BIG2[:Cw].reshape(C, w, 16)
    packedW = BIG2[Cw:].reshape(C, w, 16)
    parked2 = parked.reshape(C, w)
    busy = act.reshape(C, w)
    walk_stay = busy | contW.reshape(C, w)
    walk_free = ~walk_stay
    odk_unc = odk_live & ~parked2
    haveX = contA.reshape(C, w) | odk_unc
    Xpacked = jnp.where(parked2[..., None], packedA, odk_packed)
    Xstep = jnp.where(parked2, stepA2.reshape(C, w), odk_step)
    stepW3 = stepW2.reshape(C, w)

    seg_lo_a = jnp.asarray(seg_lo[:C], jnp.int32)[:, None]
    seg_n_a = jnp.asarray(seg_sizes[:C], jnp.int32)[:, None]

    # walking slot: keep -> spare -> pool
    fromX = walk_free & haveX
    fill1 = walk_free & ~haveX
    rank1 = jnp.cumsum(fill1.astype(jnp.int32), axis=1) - 1
    grab1 = next_ptr[:, None] + rank1
    have1 = fill1 & (grab1 < seg_n_a)
    src1 = seg_lo_a + jnp.clip(grab1, 0, seg_n_a - 1)
    next_ptr = next_ptr + jnp.sum(fill1.astype(jnp.int32), axis=1)
    new_packed = jnp.where(
        walk_stay[..., None], packedW,
        jnp.where(fromX[..., None], Xpacked,
                  jnp.where(have1[..., None], pool[src1], packedW)))
    new_step = jnp.where(walk_stay, stepW3,
                         jnp.where(fromX, Xstep, jnp.zeros_like(stepW3)))
    holding_next = walk_stay | fromX | have1

    # on-deck slot: unplaced spare -> pool
    keepX = haveX & ~fromX
    fill2 = holding_next & ~keepX
    rank2 = jnp.cumsum(fill2.astype(jnp.int32), axis=1) - 1
    grab2 = next_ptr[:, None] + rank2
    have2 = fill2 & (grab2 < seg_n_a)
    src2 = seg_lo_a + jnp.clip(grab2, 0, seg_n_a - 1)
    next_ptr = next_ptr + jnp.sum(fill2.astype(jnp.int32), axis=1)
    new_odk = jnp.where(keepX[..., None], Xpacked,
                        jnp.where(have2[..., None], pool[src2],
                                  odk_packed))
    new_odk_step = jnp.where(keepX, Xstep, jnp.zeros_like(Xstep))
    new_odk_live = keepX | have2

    # ---- seed the on-deck slots, ONE call over all chains -------------
    f32 = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
    of_flat = new_odk.reshape(Cw, 16)
    of_pos, of_dir = f32(of_flat[:, 0:3]), f32(of_flat[:, 3:6])
    of_flags = of_flat[:, 12]
    of_lht = jax.lax.bitcast_convert_type(of_flat[:, 13], jnp.int32)
    ook = (new_odk_live.reshape(Cw)
           & ((of_flags & TERM) == 0)
           & ~jnp.isnan(jnp.sum(of_dir, axis=1)
                        + jnp.sum(of_pos, axis=1)))
    od = MP.od_seed(geom, int(geom.mbvh_depth), of_pos.T, of_dir.T,
                    of_lht, ook)

    # ---- reseed fresh walks, ONE MP.seed over all chains --------------
    np_flat = new_packed.reshape(Cw, 16)
    n_pos, n_dir = f32(np_flat[:, 0:3]), f32(np_flat[:, 3:6])
    alive3 = (np_flat[:, 12] & TERM) == 0
    ok3 = ~jnp.isnan(jnp.sum(n_pos, axis=1) + jnp.sum(n_dir, axis=1))
    needf = (holding_next.reshape(Cw) & ~act & alive3 & ok3
             & (new_step.reshape(Cw) < max_steps))
    n_lht = jax.lax.bitcast_convert_type(np_flat[:, 13], jnp.int32)
    Wseed = MP.seed(geom, int(geom.mbvh_depth), n_pos.T, n_dir.T,
                    n_lht, needf)
    Wall = {k: jnp.concatenate([ln['W_' + k] for ln in lanes], axis=1)
            for k in MP.W_KEYS}
    # clear the kernel's parked bookkeeping bit
    Wall['uregs'] = Wall['uregs'].at[MP.U_PAD].set(
        jnp.zeros(Cw, jnp.uint32))
    ndm = needf[None, :]
    for k in MP.W_KEYS:
        Wall[k] = jnp.where(ndm, Wseed[k], Wall[k])

    # ---- split back per chain -----------------------------------------
    out_lanes = []
    for c in range(C):
        ln = dict(lanes[c])
        ln['packed'] = new_packed[c]
        ln['step'] = new_step[c]
        ln['holding'] = holding_next[c]
        ln['odk_packed'] = new_odk[c]
        ln['odk_step'] = new_odk_step[c]
        ln['odk_live'] = new_odk_live[c]
        for k in MP.W_KEYS:
            ln['W_' + k] = jax.lax.slice_in_dim(Wall[k], c * w,
                                                (c + 1) * w, axis=1)
        for k, v in od.items():
            ln['W_' + k] = jax.lax.slice_in_dim(v, c * w, (c + 1) * w,
                                                axis=1)
        out_lanes.append(ln)
    return out_lanes, pool, next_ptr, keys


def _service_ondeck(lanes, pools, next_ptrs, keys, geom, max_steps,
                    scatter_first, use_weights, idx_bases):
    """Ondeck-mode service: ONE merged physics pass over BOTH the
    parked (swapped-out) photons and the walking photons of every
    chain, then per-chain retire / slot redistribution / refill.

    Each lane has two photon slots: WALKING (lane photon keys + live
    walker registers) and ON-DECK (packed in ``odk_packed``).  The
    kernel's drain-restart swap (mbvh_pallas._make_kernel ondeck)
    moves the on-deck photon into the walking registers mid-window,
    parking the finished walk's results — the lane dict's photon keys
    then lag one photon behind until this pass reconciles:

      parked bit set   -> lane keys = parked photon A (results in
                          W_park); walking photon = odk_packed
      parked bit clear -> lane keys = walking photon; on-deck photon
                          (if any) unconsumed in odk_packed

    After physics, a continuing parked photon or an unconsumed on-deck
    photon (mutually exclusive — the swap consumes the on-deck slot
    when it parks) becomes the new walking photon if that slot freed,
    else goes (back) on deck; empty slots refill from the pool
    (walking slot first, then on-deck)."""
    C = len(lanes)
    ws = [ln['pos'].shape[0] for ln in lanes]
    w_all = sum(ws)
    TERM = jnp.uint32(event.TERMINAL_FLAGS)
    key0, sk = jax.random.split(keys[0])
    keys = [key0] + list(keys[1:])
    u = jax.random.uniform(sk, (2 * w_all, NDRAWS), dtype=jnp.float32)

    def cat(vals):
        return jnp.concatenate(vals, axis=0)

    # ---- per-chain views: parked set P and walking set L ------------
    parked_l, act_l, keysW_l, stepW_l, resP_l, resL_l = \
        [], [], [], [], [], []
    for ln in lanes:
        Wd = {k[2:]: ln[k] for k in _W_KEYS_OD}
        pr = MP.park_results(Wd)
        parked = pr.pop('parked')
        pr['incomplete'] = jnp.zeros(parked.shape[0], bool)
        parked_l.append(parked)
        act_l.append(ln['W_uregs'][MP.U_ACT] != 0)
        odk = _unpack(ln['odk_packed'])
        keysW_l.append({
            k: jnp.where(parked[:, None] if ln[k].ndim == 2 else parked,
                         odk[k], ln[k]) for k in _PHOTON_KEYS})
        stepW_l.append(jnp.where(parked, ln['odk_step'], ln['step']))
        resP_l.append(pr)
        resL_l.append(_pallas_results(ln))

    parked_a = cat(parked_l)
    act_a = cat(act_l)
    holding_a = cat([ln['holding'] for ln in lanes])
    BIG = {k: jnp.concatenate(
        [cat([ln[k] for ln in lanes]), cat([kw[k] for kw in keysW_l])],
        axis=0) for k in _PHOTON_KEYS}
    RES = {k: jnp.concatenate(
        [cat([r[k] for r in resP_l]), cat([r[k] for r in resL_l])],
        axis=0) for k in resL_l[0]}
    step2 = jnp.concatenate([cat([ln['step'] for ln in lanes]),
                             cat(stepW_l)])

    # ---- one merged, fully predicated physics pass ------------------
    aliveB = (BIG['flags'] & TERM) == 0
    bad = jnp.isnan(jnp.sum(BIG['dir'], axis=1)
                    + jnp.sum(BIG['pos'], axis=1))
    ready = (jnp.concatenate([parked_a, holding_a & ~act_a])
             & aliveB & (step2 < max_steps))
    nan_mask = ready & bad
    flags = jnp.where(nan_mask,
                      BIG['flags']
                      | jnp.uint32(event.NO_HIT | event.NAN_ABORT),
                      BIG['flags'])
    active = ready & ~bad
    sf = jnp.where(step2 == 0, scatter_first, 0)
    new_state = physics_update(BIG, RES, geom, u, flags, active,
                               nan_mask, sf, use_weights=use_weights)
    BIG.update(new_state)
    step2 = step2 + ready.astype(jnp.int32)

    # ---- per-chain retire / redistribute / refill -------------------
    out_lanes, out_pools, out_ptrs = [], [], []
    off = 0
    for c in range(C):
        w = ws[c]

        def slP(v, off=off, w=w):
            return jax.lax.slice_in_dim(v, off, off + w)

        def slL(v, off=off, w=w):
            return jax.lax.slice_in_dim(v, w_all + off, w_all + off + w)

        A2 = {k: slP(BIG[k]) for k in _PHOTON_KEYS}
        W2 = {k: slL(BIG[k]) for k in _PHOTON_KEYS}
        stepA2 = slP(step2)
        stepW2 = slL(step2)
        parked = parked_l[c]
        act = act_l[c]
        lane = dict(lanes[c])
        holding = lane['holding']
        pool, next_ptr = pools[c], next_ptrs[c]
        n_pool = pool.shape[0]

        termA = (A2['flags'] & TERM) != 0
        finishedA = parked & (termA | (stepA2 >= max_steps))
        contA = parked & ~finishedA
        packedA = _pack(A2)
        out_idxA = jnp.where(
            finishedA, A2['index'].astype(jnp.int32) - idx_bases[c],
            n_pool)
        pool = pool.at[out_idxA].set(packedA, mode='drop')

        termW = (W2['flags'] & TERM) != 0
        doneL = holding & ~act
        finishedW = doneL & (termW | (stepW2 >= max_steps))
        contW = doneL & ~finishedW
        packedW = _pack(W2)
        out_idxW = jnp.where(
            finishedW, W2['index'].astype(jnp.int32) - idx_bases[c],
            n_pool)
        pool = pool.at[out_idxW].set(packedW, mode='drop')

        # the spare continuing photon per lane: a surviving parked
        # photon, or the unconsumed on-deck photon (never both)
        busy = act
        walk_stay = busy | contW
        walk_free = ~walk_stay
        odk_unc = lane['odk_live'] & ~parked
        haveX = contA | odk_unc
        Xpacked = jnp.where(parked[:, None], packedA,
                            lane['odk_packed'])
        Xstep = jnp.where(parked, stepA2, lane['odk_step'])

        # walking slot: keep -> spare -> pool
        fromX = walk_free & haveX
        fill1 = walk_free & ~haveX
        rank1 = jnp.cumsum(fill1.astype(jnp.int32)) - 1
        grab1 = next_ptr + rank1
        have1 = fill1 & (grab1 < n_pool)
        src1 = jnp.clip(grab1, 0, n_pool - 1)
        next_ptr = next_ptr + jnp.sum(fill1.astype(jnp.int32))
        new_packed = jnp.where(
            walk_stay[:, None], packedW,
            jnp.where(fromX[:, None], Xpacked,
                      jnp.where(have1[:, None], pool[src1], packedW)))
        fresh = _unpack(new_packed)
        for k in _PHOTON_KEYS:
            lane[k] = fresh[k]
        lane['step'] = jnp.where(
            walk_stay, stepW2,
            jnp.where(fromX, Xstep, jnp.zeros_like(stepW2)))
        holding_next = walk_stay | fromX | have1
        lane['holding'] = holding_next

        # on-deck slot: unplaced spare -> pool
        keepX = haveX & ~fromX
        fill2 = holding_next & ~keepX
        rank2 = jnp.cumsum(fill2.astype(jnp.int32)) - 1
        grab2 = next_ptr + rank2
        have2 = fill2 & (grab2 < n_pool)
        src2 = jnp.clip(grab2, 0, n_pool - 1)
        next_ptr = next_ptr + jnp.sum(fill2.astype(jnp.int32))
        lane['odk_packed'] = jnp.where(
            keepX[:, None], Xpacked,
            jnp.where(have2[:, None], pool[src2], lane['odk_packed']))
        lane['odk_step'] = jnp.where(keepX, Xstep, jnp.int32(0))
        lane['odk_live'] = keepX | have2

        # clear the kernel bookkeeping bits; seed the on-deck slot and
        # reseed fresh walks
        lane['W_uregs'] = lane['W_uregs'].at[MP.U_PAD].set(
            jnp.zeros(w, jnp.uint32))
        ofresh = _unpack(lane['odk_packed'])
        ook = (lane['odk_live']
               & ((ofresh['flags'] & TERM) == 0)
               & ~jnp.isnan(jnp.sum(ofresh['dir'], axis=1)
                            + jnp.sum(ofresh['pos'], axis=1)))
        od = MP.od_seed(geom, int(geom.mbvh_depth), ofresh['pos'].T,
                        ofresh['dir'].T, ofresh['last_hit_triangle'],
                        ook)
        for k, v in od.items():
            lane['W_' + k] = v
        alive3 = (lane['flags'] & TERM) == 0
        ok = ~jnp.isnan(jnp.sum(lane['dir'], axis=1)
                        + jnp.sum(lane['pos'], axis=1))
        need = (holding_next & ~busy & alive3 & ok
                & (lane['step'] < max_steps))
        lane = _reseed_pallas(lane, need, geom)
        out_lanes.append(lane)
        out_pools.append(pool)
        out_ptrs.append(next_ptr)
        off += w
    return out_lanes, out_pools, out_ptrs, keys


def _service(lane, pool, next_ptr, key, geom, max_steps, scatter_first,
             use_weights, idx_base=0, pal=False):
    """Physics + retire + refill pass over all lanes (predicated).
    ``pool`` is the packed (n, 16) photon pool (see _pack) — for a
    pipelined chain, its private pool segment, with ``idx_base`` the
    segment's first global photon index (retiring lanes scatter to
    slot ``index - idx_base``)."""
    w = lane['pos'].shape[0]
    n_pool = pool.shape[0]
    key, sk = jax.random.split(key)
    u = jax.random.uniform(sk, (w, NDRAWS), dtype=jnp.float32)

    holding = lane['holding']
    alive = (lane['flags'] & jnp.uint32(event.TERMINAL_FLAGS)) == 0
    if pal:
        trav_done = lane['W_uregs'][MP.U_ACT] == 0
    else:
        trav_done = ~jnp.any(lane['masks'] != 0, axis=(1, 2))

    # NaN guard (reference: chroma/cuda/propagate.cu:262).  NaN lanes
    # were never reseeded, so they are trav_done with an empty result.
    bad = jnp.isnan(jnp.sum(lane['dir'], axis=1)
                    + jnp.sum(lane['pos'], axis=1))
    ready = holding & alive & trav_done & (lane['step'] < max_steps)
    nan_mask = ready & bad
    flags = jnp.where(nan_mask,
                      lane['flags']
                      | jnp.uint32(event.NO_HIT | event.NAN_ABORT),
                      lane['flags'])
    active = ready & ~bad

    if pal:
        res = _pallas_results(lane)
    else:
        res = dict(triangle=lane['best_tri'], distance=lane['min_dist'],
                   normal=lane['best_norm'],
                   material_code=lane['best_mat'],
                   incomplete=jnp.zeros(w, bool))
    sf = jnp.where(lane['step'] == 0, scatter_first, 0)
    pstate = {k: lane[k] for k in _PHOTON_KEYS}
    new_state = physics_update(pstate, res, geom, u, flags, active,
                               nan_mask, sf, use_weights=use_weights)
    lane = dict(lane, **new_state)
    lane['step'] = lane['step'] + ready.astype(jnp.int32)

    # ---- retire: write finished (or out-of-steps) photons back ------
    alive2 = (lane['flags'] & jnp.uint32(event.TERMINAL_FLAGS)) == 0
    finished = holding & trav_done & (~alive2
                                      | (lane['step'] >= max_steps))
    out_idx = jnp.where(finished,
                        lane['index'].astype(jnp.int32) - idx_base, n_pool)
    packed = _pack(lane)
    pool = pool.at[out_idx].set(packed, mode='drop')

    # ---- refill from the pool ----------------------------------------
    rank = jnp.cumsum(finished.astype(jnp.int32)) - 1
    grab = next_ptr + rank
    have = finished & (grab < n_pool)
    src = jnp.clip(grab, 0, n_pool - 1)
    fresh = _unpack(jnp.where(have[:, None], pool[src], packed))
    for k in _PHOTON_KEYS:
        lane[k] = fresh[k]
    lane['step'] = jnp.where(have, 0, lane['step'])
    lane['holding'] = (holding & ~finished) | have
    next_ptr = next_ptr + jnp.sum(finished.astype(jnp.int32))

    # ---- reseed traversal for lanes starting their next step ---------
    alive3 = (lane['flags'] & jnp.uint32(event.TERMINAL_FLAGS)) == 0
    ok = ~jnp.isnan(jnp.sum(lane['dir'], axis=1)
                    + jnp.sum(lane['pos'], axis=1))
    need = lane['holding'] & alive3 & ok & trav_done \
        & (lane['step'] < max_steps)
    lane = _reseed_pallas(lane, need, geom) if pal \
        else _reseed(lane, need, geom)
    return lane, pool, next_ptr, key


def _service_all(lanes, pools, next_ptrs, keys, geom, max_steps,
                 scatter_first, use_weights, idx_bases, pal):
    """Service every chain in ONE merged physics pass.

    The service pass is dominated by per-op fixed costs, not volume
    (profile_service2: a fully stubbed pass still costs ~0.13 ms at
    w=8192), so running the draw + predication lattice + physics once
    over the concatenated lanes costs roughly one chain's base instead
    of C of them.  Only the photon-side keys are concatenated (cheap
    (w, 3)-ish arrays); the pool retire/refill and the traversal
    reseed — which touch per-chain pools and the big transposed
    walker state — stay per chain."""
    C = len(lanes)
    if C == 1:
        lane, pool, ptr, key = _service(
            lanes[0], pools[0], next_ptrs[0], keys[0], geom, max_steps,
            scatter_first, use_weights, idx_base=idx_bases[0], pal=pal)
        return [lane], [pool], [ptr], [key]
    ws = [lane['pos'].shape[0] for lane in lanes]
    w_all = sum(ws)
    key0, sk = jax.random.split(keys[0])
    keys = [key0] + list(keys[1:])
    u = jax.random.uniform(sk, (w_all, NDRAWS), dtype=jnp.float32)

    def cat(k):
        return jnp.concatenate([ln[k] for ln in lanes], axis=0)

    big = {k: cat(k) for k in _PHOTON_KEYS}
    step = cat('step')
    holding = cat('holding')
    if pal:
        trav_done = jnp.concatenate(
            [ln['W_uregs'][MP.U_ACT] == 0 for ln in lanes])
        parts = [_pallas_results(ln) for ln in lanes]
    else:
        trav_done = jnp.concatenate(
            [~jnp.any(ln['masks'] != 0, axis=(1, 2)) for ln in lanes])
        parts = [dict(triangle=ln['best_tri'], distance=ln['min_dist'],
                      normal=ln['best_norm'],
                      material_code=ln['best_mat'],
                      incomplete=jnp.zeros(w, bool))
                 for w, ln in zip(ws, lanes)]
    res = {k: jnp.concatenate([p[k] for p in parts], axis=0)
           for k in parts[0]}

    alive = (big['flags'] & jnp.uint32(event.TERMINAL_FLAGS)) == 0
    bad = jnp.isnan(jnp.sum(big['dir'], axis=1)
                    + jnp.sum(big['pos'], axis=1))
    ready = holding & alive & trav_done & (step < max_steps)
    nan_mask = ready & bad
    flags = jnp.where(nan_mask,
                      big['flags']
                      | jnp.uint32(event.NO_HIT | event.NAN_ABORT),
                      big['flags'])
    active = ready & ~bad
    sf = jnp.where(step == 0, scatter_first, 0)
    new_state = physics_update(big, res, geom, u, flags, active,
                               nan_mask, sf, use_weights=use_weights)
    big.update(new_state)
    step = step + ready.astype(jnp.int32)

    # ---- split back; per-chain retire/refill/reseed tails -----------
    out_lanes, out_pools, out_ptrs = [], [], []
    off = 0
    for c in range(C):
        w = ws[c]

        def sl(v, off=off, w=w):
            return jax.lax.slice_in_dim(v, off, off + w)

        lane = dict(lanes[c], step=sl(step))
        for k in _PHOTON_KEYS:
            lane[k] = sl(big[k])
        pool, next_ptr = pools[c], next_ptrs[c]
        n_pool = pool.shape[0]
        holding_c = sl(holding)
        trav_done_c = sl(trav_done)

        alive2 = (lane['flags'] & jnp.uint32(event.TERMINAL_FLAGS)) == 0
        finished = holding_c & trav_done_c \
            & (~alive2 | (lane['step'] >= max_steps))
        out_idx = jnp.where(
            finished, lane['index'].astype(jnp.int32) - idx_bases[c],
            n_pool)
        packed = _pack(lane)
        pool = pool.at[out_idx].set(packed, mode='drop')

        rank = jnp.cumsum(finished.astype(jnp.int32)) - 1
        grab = next_ptr + rank
        have = finished & (grab < n_pool)
        src = jnp.clip(grab, 0, n_pool - 1)
        fresh = _unpack(jnp.where(have[:, None], pool[src], packed))
        for k in _PHOTON_KEYS:
            lane[k] = fresh[k]
        lane['step'] = jnp.where(have, 0, lane['step'])
        lane['holding'] = (holding_c & ~finished) | have
        next_ptr = next_ptr + jnp.sum(finished.astype(jnp.int32))

        alive3 = (lane['flags'] & jnp.uint32(event.TERMINAL_FLAGS)) == 0
        ok = ~jnp.isnan(jnp.sum(lane['dir'], axis=1)
                        + jnp.sum(lane['pos'], axis=1))
        need = lane['holding'] & alive3 & ok & trav_done_c \
            & (lane['step'] < max_steps)
        lane = _reseed_pallas(lane, need, geom) if pal \
            else _reseed(lane, need, geom)
        out_lanes.append(lane)
        out_pools.append(pool)
        out_ptrs.append(next_ptr)
        off += w
    return out_lanes, out_pools, out_ptrs, keys


def _compact_lanes(lane, m):
    """Stable-partition holding lanes to the front; keep the first m.
    Pallas-walker arrays (``W_`` keys) are (rows, lanes)-transposed and
    compact along axis 1."""
    n = lane['holding'].shape[0]
    holding = lane['holding']
    cnt = jnp.cumsum(holding.astype(jnp.int32))
    rank_dead = jnp.cumsum((~holding).astype(jnp.int32)) - 1
    dest = jnp.where(holding, cnt - 1, cnt[-1] + rank_dead)
    src = jnp.zeros(n, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32))
    idx = src[:m]
    return {k: (v if v.ndim == 0
                else (v[:, idx] if k.startswith('W_') else v[idx]))
            for k, v in lane.items()}


def _make_lane(state, geom, lo, w, depth, pal=False, ondeck=False,
               packed=None):
    """Initial lane state for one chain: pool photons [lo, lo+w).
    Ondeck lanes (``packed`` given) store the photon as one packed
    (w, 16) array; other modes keep the SoA photon keys."""
    lane = {k: jax.lax.slice_in_dim(v, lo, lo + w) for k, v in
            state.items()}
    lane_common = dict(
        holding=jnp.ones(w, bool),
        step=jnp.zeros(w, jnp.int32),
        iters=jnp.zeros((), jnp.int32),
        nactive=jnp.zeros((), jnp.int32),
    )
    alive = (lane['flags'] & jnp.uint32(event.TERMINAL_FLAGS)) == 0
    ok = ~jnp.isnan(jnp.sum(lane['dir'], axis=1)
                    + jnp.sum(lane['pos'], axis=1))
    if pal:
        W = MP.seed(geom, int(geom.mbvh_depth), lane['pos'].T,
                    lane['dir'].T, lane['last_hit_triangle'],
                    alive & ok)
        if ondeck and packed is not None:
            lane = dict(packed=jax.lax.slice_in_dim(packed, lo, lo + w),
                        **lane_common)
        else:
            lane.update(lane_common)
        lane.update({'W_' + k: v for k, v in W.items()})
        if ondeck:
            # empty on-deck/park slots; the first service pass fills
            # them from the pool
            lane.update({'W_' + k: v
                         for k, v in MP.ondeck_empty(w).items()})
            lane.update(odk_packed=jnp.zeros((w, 16), jnp.uint32),
                        odk_step=jnp.zeros(w, jnp.int32),
                        odk_live=jnp.zeros(w, bool))
        return lane
    lane.update(lane_common)
    lane.update(
        masks=jnp.zeros((w, depth, NMASK_WORDS), jnp.uint32),
        bases=jnp.zeros((w, depth), jnp.uint32),
        tcodes=jnp.full((w, depth, mbvh.BRANCH), 65535, jnp.uint16),
        best_tri=jnp.full(w, -1, jnp.int32),
        min_dist=jnp.full(w, jnp.inf, jnp.float32),
        best_norm=jnp.zeros((w, 3), jnp.float32),
        best_mat=jnp.zeros(w, jnp.uint32),
        inv_dir=jnp.zeros((w, 3), jnp.float32),
        noid=jnp.zeros((w, 3), jnp.float32),
        lht=lane['last_hit_triangle'],
        org=lane['pos'],
        **mbvh.extra_state(geom, w),
    )
    return _reseed(lane, alive & ok, geom)


@partial(jax.jit, static_argnames=('max_steps', 'use_weights', 'width',
                                   'service_every', 'chains',
                                   'use_pallas', 'prune',
                                   'service_frac', 'collect_stats',
                                   'ondeck'))
def propagate_fused(state, geom, key, max_steps=100, use_weights=False,
                    scatter_first=0, width=None,
                    service_every=SERVICE_EVERY, chains=None,
                    use_pallas=None, prune=None, service_frac=None,
                    collect_stats=None, ondeck=None):
    """Propagate all photons in ``state`` to termination, fused.

    Returns ``(final_state, stats)`` where ``stats`` is an int32[4]
    vector [service_passes, photon_steps, lane_iterations,
    active_lane_iterations].  Output order == input order: retiring
    lanes scatter into the pool at slot ``index``, and the pool is
    consumed sequentially, so the state is re-indexed 0..n-1 here and
    the caller's ``index`` restored on return (an arbitrary permuted
    index input would otherwise overwrite not-yet-run photons).

    ``chains``: number of independent software-pipelined lane batches
    (see module docstring); each owns ``width/chains`` lanes and a
    private photon-pool segment.  Defaults to CHROMA_TPU_CHAINS (2),
    dropping to 1 when the batch is too small to split.

    ``service_frac``: if set (or via CHROMA_TPU_SERVICE_FRAC), use a
    *dynamic* service cadence: each chain runs its physics pass under
    ``lax.cond`` as soon as >= frac of its holding lanes (or all of
    them) have drained their walks, instead of every ``service_every``
    iterations.  RNG pairing differs from the static cadence (draws
    are consumed per service pass), so results differ seed-to-seed but
    sample the same distributions.

    ``collect_stats``: accumulate per-iteration active-lane counts into
    ``stats[3]`` (the tune tools' util / rows-per-photon-step input).
    The count is a full-width reduction after EVERY walker iteration —
    measurable overhead on the hot path — so it defaults to off
    (``stats[3] = 0``) unless CHROMA_TPU_STATS=1; stats[0..2] are
    window-level sums and always collected.
    """
    if collect_stats is None:
        collect_stats = os.environ.get('CHROMA_TPU_STATS', '0') == '1'
    pal = _use_pallas_default() if use_pallas is None else use_pallas
    if ondeck is None:
        ondeck = os.environ.get('CHROMA_TPU_ONDECK', '1') == '1'
    # the drain-restart path lives in the Pallas kernel and uses the
    # static service cadence
    ondeck = bool(ondeck) and pal and service_frac is None \
        and os.environ.get('CHROMA_TPU_SERVICE_FRAC') is None
    caller_index = state['index']
    state = dict(state, index=jnp.arange(state['pos'].shape[0],
                                         dtype=jnp.uint32))
    n = state['pos'].shape[0]
    w_total = width or min(n, DEFAULT_WIDTH)
    w_total = min(w_total, n)
    nchains = chains or DEFAULT_CHAINS
    while nchains > 1 and (w_total // nchains < MIN_CHAIN_WIDTH
                           or n // nchains < MIN_CHAIN_WIDTH):
        nchains -= 1
    depth = min(geom.mbvh_depth, mbvh.MAX_LEVELS)

    packed = _pack(state)
    # chain c owns pool segment [seg_lo[c], seg_lo[c+1]) and starts
    # holding its first w_c photons
    base, rem = divmod(n, nchains)
    seg_sizes = [base + (1 if c < rem else 0) for c in range(nchains)]
    seg_lo = np.concatenate([[0], np.cumsum(seg_sizes)]).astype(int)
    w_c = [min(w_total // nchains, seg_sizes[c]) for c in range(nchains)]

    # v2 = the chain-batched service experiment (measured loss; see
    # _service_ondeck_v2) — opt in with CHROMA_TPU_ONDECK_V2=1
    odk_v2 = ondeck and os.environ.get('CHROMA_TPU_ONDECK_V2') == '1'
    if odk_v2:
        # chain-batched service: ONE global pool, (C,) refill pointers
        pools = [packed]
        next_ptrs = [jnp.asarray(w_c, jnp.int32)]
        lanes = [_make_lane(state, geom, seg_lo[c], w_c[c], depth,
                            pal=pal, ondeck=True, packed=packed)
                 for c in range(nchains)]
    else:
        pools = [jax.lax.slice_in_dim(packed, seg_lo[c], seg_lo[c + 1])
                 for c in range(nchains)]
        lanes = [_make_lane(state, geom, seg_lo[c], w_c[c], depth,
                            pal=pal, ondeck=ondeck)
                 for c in range(nchains)]
        next_ptrs = [jnp.asarray(w_c[c], jnp.int32)
                     for c in range(nchains)]
    keys = list(jax.random.split(key, nchains))

    # stats: [services, photon_steps, lane_iters, pending_lane_iters]
    stats = jnp.zeros(4, jnp.int32)

    # lazy-prune cadence: 'half' prunes on alternate iterations (r2
    # default), 'off' never (cheapest body; relies on nearest-first
    # popping + the SAH tree), 'on' every iteration.  The pallas
    # walker integrates (per-level) pruning into every pop for free —
    # its pop sequence matches the jnp walker at prune='on'.
    if prune is None:
        prune = os.environ.get('CHROMA_TPU_PRUNE', 'half')
    # dynamic service cadence: service a chain whenever >= this
    # fraction of its lanes have drained (None = static service_every)
    sfrac = service_frac
    if sfrac is None:
        env_sf = os.environ.get('CHROMA_TPU_SERVICE_FRAC')
        sfrac = float(env_sf) if env_sf else None
    body_walk = mbvh._walk_body(geom, depth, do_prune=(prune != 'off'))
    body_walk_np = mbvh._walk_body(geom, depth,
                                   do_prune=(prune == 'on'))

    if pal:
        instanced = bool(geom.mbvh_instanced)
        p_depth = int(geom.mbvh_depth)
        sq = mbvh.tquant_scale(geom)
        rows = geom.mbvh_rows
        rbase = rows[0, mbvh.HDR_BASE].astype(jnp.int32) if ondeck \
            else None
        wkeys = _W_KEYS_OD if ondeck else _W_KEYS

        def pallas_step(lane):
            W = {k[2:]: lane[k] for k in wkeys}
            ptr = jax.lax.bitcast_convert_type(W['uregs'][MP.U_PTR],
                                               jnp.int32)
            row_t = rows[ptr].T
            W = MP.walk_iter(row_t, W, p_depth, instanced, sq,
                             do_prune=(prune != 'off'),
                             ondeck=ondeck, rbase=rbase)
            out = dict(lane)
            out.update({'W_' + k: v for k, v in W.items()})
            out['iters'] = lane['iters'] + 1
            if collect_stats:
                out['nactive'] = lane['nactive'] + jnp.sum(
                    jax.lax.bitcast_convert_type(
                        W['uregs'][MP.U_ACT], jnp.int32))
            return out

    def _chain_pending(lane):
        if pal:
            return lane['W_uregs'][MP.U_ACT] != 0
        return jnp.any(lane['masks'] != 0, axis=(1, 2))

    def make_body():
        def body(carry):
            lanes, pools, next_ptrs, keys, stats = carry
            lanes = list(lanes)
            pools = list(pools)
            next_ptrs = list(next_ptrs)
            keys = list(keys)
            # interleave the chains' walker iterations so the
            # scheduler can ride chain A's row fetch under chain B's
            # triangle tests (the chains share no state)
            for i in range(service_every):
                if pal:
                    wf = pallas_step
                else:
                    wf = body_walk if i % 2 == 0 else body_walk_np
                for c in range(len(lanes)):
                    lanes[c] = wf(lanes[c])
            for c in range(len(lanes)):
                holding = lanes[c]['holding']
                ready = jnp.sum(holding & ~_chain_pending(lanes[c])) \
                    .astype(jnp.int32)
                if ondeck:
                    # parked (swapped-out) photons are serviced too —
                    # a lane can retire BOTH a parked and a live-done
                    # photon in one pass, so add, don't OR
                    pad = jax.lax.bitcast_convert_type(
                        lanes[c]['W_uregs'][MP.U_PAD], jnp.int32)
                    ready = ready + jnp.sum((pad & 1) != 0) \
                        .astype(jnp.int32)
                stats = stats + jnp.stack(
                    [jnp.asarray(1 if c == 0 else 0, jnp.int32),
                     ready,
                     jnp.sum(holding).astype(jnp.int32) * service_every,
                     jnp.asarray(0, jnp.int32)])
            if odk_v2:
                lanes, pool, ptr, keys = _service_ondeck_v2(
                    lanes, pools[0], next_ptrs[0], keys, geom,
                    max_steps, scatter_first, use_weights,
                    [int(x) for x in seg_lo[:len(lanes)]],
                    [int(x) for x in seg_sizes[:len(lanes)]])
                pools, next_ptrs = [pool], [ptr]
            elif ondeck:
                lanes, pools, next_ptrs, keys = _service_ondeck(
                    lanes, pools, next_ptrs, keys, geom, max_steps,
                    scatter_first, use_weights,
                    [int(x) for x in seg_lo[:len(lanes)]])
            else:
                lanes, pools, next_ptrs, keys = _service_all(
                    lanes, pools, next_ptrs, keys, geom, max_steps,
                    scatter_first, use_weights,
                    [int(x) for x in seg_lo[:len(lanes)]], pal)
            return (tuple(lanes), tuple(pools), tuple(next_ptrs),
                    tuple(keys), stats)
        return body

    def make_body_dynamic(frac):
        """One walker iteration per body; each chain runs its physics
        pass under ``lax.cond``, only once enough of its holding lanes
        have drained (>= frac of the chain width, or all of them).
        Decouples the service cadence from a fixed count so lanes
        don't idle out the tail of a static window."""
        def body(carry):
            lanes, pools, next_ptrs, keys, stats = carry
            lanes = list(lanes)
            pools = list(pools)
            next_ptrs = list(next_ptrs)
            keys = list(keys)
            for c in range(len(lanes)):
                lanes[c] = (pallas_step if pal
                            else body_walk)(lanes[c])
            for c in range(len(lanes)):
                holding = lanes[c]['holding']
                ready = holding & ~_chain_pending(lanes[c])
                nh = jnp.sum(holding).astype(jnp.int32)
                nd = jnp.sum(ready).astype(jnp.int32)
                target = jnp.minimum(
                    jnp.int32(max(1, int(frac * holding.shape[0]))), nh)
                do_svc = (nh > 0) & (nd >= target)
                stats = stats + jnp.stack(
                    [jnp.asarray(0, jnp.int32),
                     jnp.asarray(0, jnp.int32), nh,
                     jnp.asarray(0, jnp.int32)])

                def _svc(args, c=c, nd=nd):
                    lane, pool, ptr, key, stats = args
                    stats = stats + jnp.stack(
                        [jnp.asarray(1 if c == 0 else 0, jnp.int32),
                         nd, jnp.asarray(0, jnp.int32),
                         jnp.asarray(0, jnp.int32)])
                    lane, pool, ptr, key = _service(
                        lane, pool, ptr, key, geom, max_steps,
                        scatter_first, use_weights,
                        idx_base=int(seg_lo[c]), pal=pal)
                    return lane, pool, ptr, key, stats

                (lanes[c], pools[c], next_ptrs[c], keys[c],
                 stats) = jax.lax.cond(
                    do_svc, _svc, lambda args: args,
                    (lanes[c], pools[c], next_ptrs[c], keys[c], stats))
            return (tuple(lanes), tuple(pools), tuple(next_ptrs),
                    tuple(keys), stats)
        return body

    def run_stage(lanes, pools, next_ptrs, keys, stats, targets):
        """Run until every chain drains (or, with per-chain lane
        ``targets``, until each active chain's pool segment is dry and
        few enough lanes remain to compact)."""
        def cond(carry):
            lanes, pools, next_ptrs, kk, stats = carry
            go = None
            for c in range(len(lanes)):
                active = jnp.any(lanes[c]['holding'])
                if targets is None:
                    more = active
                else:
                    nhold = jnp.sum(lanes[c]['holding'].astype(jnp.int32))
                    if odk_v2:
                        seg_n = int(seg_sizes[c])
                        ptr_c = next_ptrs[0][c]
                    else:
                        seg_n = pools[c].shape[0]
                        ptr_c = next_ptrs[c]
                    more = active & ((ptr_c < seg_n)
                                     | (nhold > targets[c]))
                go = more if go is None else (go | more)
            return go

        if sfrac is not None:
            body_fn = make_body_dynamic(sfrac)
        else:
            body_fn = make_body()
        return jax.lax.while_loop(
            cond, body_fn,
            (tuple(lanes), tuple(pools), tuple(next_ptrs), tuple(keys),
             stats))

    carry = (lanes, pools, next_ptrs, keys, stats)
    # pallas lane widths must stay whole blocks: a ragged tail block
    # would be padded per walk_iter call (copies every iteration)
    blk = MP.DEFAULT_BLOCK if pal else 1
    if min(w_c) * nchains > 4096 and len(DRAIN_SHRINK):
        for shrink in DRAIN_SHRINK:
            # shrink factors are relative to each chain's ORIGINAL
            # width (w/8 then w/64, as the single-chain driver did)
            targets = [-(-max(w_c[c] // shrink, 1024 // nchains)
                         // blk) * blk
                       for c in range(nchains)]
            carry = run_stage(*carry, targets)
            lanes, pools, next_ptrs, keys, stats = carry
            lanes = tuple(_compact_lanes(lanes[c], targets[c])
                          for c in range(nchains))
            carry = (lanes, pools, next_ptrs, keys, stats)
    lanes, pools, next_ptrs, keys, stats = run_stage(*carry, None)

    stats = stats.at[3].set(sum(lane['nactive'] for lane in lanes))
    out = _unpack(jnp.concatenate(pools, axis=0))
    out['index'] = caller_index
    return out, stats
