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
# at the r3 se=10; tools/tune_ondeck.py), re-confirmed r5 through the
# OFFICIAL bench protocol where se=15/16/17 plateau at 2.20-2.22M and
# se=18 drops (tools/tune_bench.py + ARCHITECTURE.md).  Env knob:
# the service window is UNROLLED in the jitted driver, so compile time
# grows with it — the CPU test suite pins a smaller value (conftest).
SERVICE_EVERY = int(os.environ.get('CHROMA_TPU_SERVICE_EVERY', 17))
DEFAULT_WIDTH = int(os.environ.get('CHROMA_TPU_WIDTH', 12288))
                        # total lane width across chains: 3 chains of
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
_W_KEYS_OD2 = tuple('W_' + k for k in MP.OD2_W_KEYS)


def _w_keys_od(od_slots):
    return _W_KEYS_OD2 if od_slots == 2 else _W_KEYS_OD


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


# ---- packed-row column views (ondeck lanes keep the photon PACKED:
# one (w, 16) u32 array instead of ten SoA keys, so the op-count-bound
# service pass spends ONE select/concat where the SoA layout spent ten)
def _p_f32(p, lo, hi):
    return jax.lax.bitcast_convert_type(p[:, lo:hi], jnp.float32)


def _p_i32(p, col):
    return jax.lax.bitcast_convert_type(p[:, col], jnp.int32)


def _p_posdir_ok(p):
    """alive-and-finite predicate of packed rows: no terminal flag and
    no NaN in pos/dir (the same guard the SoA path computes)."""
    ok = ~jnp.isnan(jnp.sum(_p_f32(p, 0, 3), axis=1)
                    + jnp.sum(_p_f32(p, 3, 6), axis=1))
    alive = (p[:, 12] & jnp.uint32(event.TERMINAL_FLAGS)) == 0
    return alive & ok


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


def _reseed_pallas_from(lane, pos_t, dir_t, lht, need, geom):
    """Restart the walk (root children slab-tested + first child popped
    inline in MP.seed) for lanes in ``need``; ray inputs given
    transposed ((3, w) pos/dir)."""
    depth = int(geom.mbvh_depth)
    W2 = MP.seed(geom, depth, pos_t, dir_t, lht, need)
    out = dict(lane)
    nd = need[None, :]
    for k in _W_KEYS:
        out[k] = jnp.where(nd, W2[k[2:]], lane[k])
    return out


def _reseed_pallas(lane, need, geom):
    """Pallas-mode _reseed from the lane's SoA photon keys."""
    return _reseed_pallas_from(lane, lane['pos'].T, lane['dir'].T,
                               lane['last_hit_triangle'], need, geom)


def _pallas_results(lane):
    """Traversal results for the service pass, pallas-mode lanes."""
    W = {k[2:]: lane[k] for k in _W_KEYS}
    r = MP.results(W)
    w = lane['W_uregs'].shape[1]
    return dict(triangle=r['triangle'], distance=r['distance'],
                normal=r['normal'], material_code=r['material_code'],
                incomplete=jnp.zeros(w, bool))


def _service_ondeck(lanes, pools, next_ptrs, keys, geom, max_steps,
                    scatter_first, use_weights, idx_bases, od_slots=1):
    """Ondeck-mode service: ONE merged physics pass over the parked
    (swapped-out) photons and the walking photons of every chain, then
    per-chain retire / slot redistribution / refill.

    Each lane has 1 + ``od_slots`` photon slots: WALKING (live walker
    registers) and one or two ON-DECK slots (packed in ``odk_packed``
    / ``odk2_packed``).  The kernel's drain-restart swap cascade
    (mbvh_pallas._make_kernel ondeck) moves on-deck photons into the
    walking registers mid-window, parking finished walks' results —
    the packed storage then lags behind until this pass reconciles.
    Storage map by (parked, parked2) pad bits:

      (0, *) -> lane keys = walking photon; odk/odk2 unconsumed if
                their live flags are set
      (1, 0) -> lane keys = photon A (results in W_park); walking
                photon = odk_packed; odk2 unconsumed if live
      (1, 1) -> lane keys = photon A (W_park); odk_packed = photon B
                (results in W_park2); walking photon = odk2_packed

    After physics, surviving parked photons and unconsumed on-deck
    photons become the lane's spares (at most two, one per on-deck
    slot of origin); slots refill walking-first, then od1, then od2,
    spares before pool.  od2 is never filled on a lane whose od1 slot
    is empty (the kernel cascade consumes od1 first)."""
    C = len(lanes)
    ws = [ln['pk'].shape[0] for ln in lanes]
    w_all = sum(ws)
    nsets = 1 + od_slots
    TERM = jnp.uint32(event.TERMINAL_FLAGS)
    key0, sk = jax.random.split(keys[0])
    keys = [key0] + list(keys[1:])
    u = jax.random.uniform(sk, (nsets * w_all, NDRAWS),
                           dtype=jnp.float32)

    def cat(vals):
        return jnp.concatenate(vals, axis=0)

    # ---- per-chain views: parked sets A/B and walking set L ---------
    # photons ride PACKED ((w, 16) u32 rows): the pass is op-count
    # bound, so every select/concat here is one array op instead of
    # ten SoA ones (r5; the r4 layout spent ~10x the ops)
    parked_l, parked2_l, act_l = [], [], []
    pkW_l, stepB_l, stepW_l = [], [], []
    resA_l, resB_l, resL_l = [], [], []
    for ln in lanes:
        Wd = {k[2:]: ln[k] for k in _w_keys_od(od_slots)}
        pr = MP.park_results(Wd)
        parked = pr.pop('parked')
        pr['incomplete'] = jnp.zeros(parked.shape[0], bool)
        parked_l.append(parked)
        act_l.append(ln['W_uregs'][MP.U_ACT] != 0)
        resA_l.append(pr)
        resL_l.append(_pallas_results(ln))
        if od_slots == 2:
            pr2 = MP.park_results(Wd, 'park2')
            parked2 = pr2.pop('parked')
            pr2['incomplete'] = jnp.zeros(parked2.shape[0], bool)
            parked2_l.append(parked2)
            resB_l.append(pr2)
            stepB_l.append(ln['odk_step'])
            pkW_l.append(jnp.where(
                parked2[:, None], ln['odk2_packed'],
                jnp.where(parked[:, None], ln['odk_packed'],
                          ln['pk'])))
            stepW_l.append(jnp.where(parked2, ln['odk2_step'],
                                     jnp.where(parked, ln['odk_step'],
                                               ln['step'])))
        else:
            pkW_l.append(jnp.where(parked[:, None], ln['odk_packed'],
                                   ln['pk']))
            stepW_l.append(jnp.where(parked, ln['odk_step'],
                                     ln['step']))

    parked_a = cat(parked_l)
    act_a = cat(act_l)
    holding_a = cat([ln['holding'] for ln in lanes])
    # set layout: [A (lane rows) | (B = odk storage, slots=2) | L]
    pk_parts = [cat([ln['pk'] for ln in lanes])]
    if od_slots == 2:
        pk_parts.append(cat([ln['odk_packed'] for ln in lanes]))
    pk_parts.append(cat(pkW_l))
    BIG = _unpack(jnp.concatenate(pk_parts, axis=0))
    res_groups = [resA_l] + ([resB_l] if od_slots == 2 else []) \
        + [resL_l]
    RES = {k: jnp.concatenate([cat([r[k] for r in grp])
                               for grp in res_groups], axis=0)
           for k in resL_l[0]}
    step_parts = [cat([ln['step'] for ln in lanes])]
    if od_slots == 2:
        step_parts.append(cat(stepB_l))
    step_parts.append(cat(stepW_l))
    step2 = jnp.concatenate(step_parts)

    # ---- one merged, fully predicated physics pass ------------------
    aliveB = (BIG['flags'] & TERM) == 0
    bad = jnp.isnan(jnp.sum(BIG['dir'], axis=1)
                    + jnp.sum(BIG['pos'], axis=1))
    ready_parts = [parked_a]
    if od_slots == 2:
        ready_parts.append(cat(parked2_l))
    ready_parts.append(holding_a & ~act_a)
    ready = jnp.concatenate(ready_parts) & aliveB & (step2 < max_steps)
    nan_mask = ready & bad
    flags = jnp.where(nan_mask,
                      BIG['flags']
                      | jnp.uint32(event.NO_HIT | event.NAN_ABORT),
                      BIG['flags'])
    active = ready & ~bad
    sf = jnp.where(step2 == 0, scatter_first, 0)
    if os.environ.get('CHROMA_TPU_PHYS_BARRIER', '0') == '1':
        # experimental: fence the physics lattice from the retire/
        # refill tails.  optimization_barrier is a value identity;
        # the probe (tools/probe_physics_cost.py) shows the lattice is
        # cheap standalone and its in-context cost is fusion/scheduling
        # interaction, so isolating it MAY schedule better.
        (BIG, RES, u, flags, active, nan_mask, sf) = \
            jax.lax.optimization_barrier(
                (BIG, RES, u, flags, active, nan_mask, sf))
        new_state = physics_update(BIG, RES, geom, u, flags, active,
                                   nan_mask, sf,
                                   use_weights=use_weights)
        new_state = jax.lax.optimization_barrier(new_state)
    else:
        new_state = physics_update(BIG, RES, geom, u, flags, active,
                                   nan_mask, sf,
                                   use_weights=use_weights)
    BIG.update(new_state)
    step2 = step2 + ready.astype(jnp.int32)
    # repack ONCE for every set's retire/spare plumbing below.  Rows
    # the physics pass did not advance (``~ready`` — terminal on
    # arrival, empty slots) must keep their exact original words: the
    # unpack -> f32 select -> repack cycle canonicalizes subnormal /
    # NaN-payload float patterns on XLA:TPU (the round-4 flush class,
    # caught by referee check 1), so the final select is done at the
    # u32 level where every backend is bit-exact.
    PK2 = jnp.where(ready[:, None], _pack(BIG),
                    jnp.concatenate(pk_parts, axis=0))
    flags2 = BIG['flags']
    idx2 = BIG['index'].astype(jnp.int32)

    # ---- per-chain retire / redistribute / refill -------------------
    out_lanes, out_pools, out_ptrs = [], [], []
    off = 0
    for c in range(C):
        w = ws[c]

        def sl(v, g, off=off, w=w):
            return jax.lax.slice_in_dim(v, g * w_all + off,
                                        g * w_all + off + w)

        gL = nsets - 1
        packedA = sl(PK2, 0)
        packedW = sl(PK2, gL)
        stepA2 = sl(step2, 0)
        stepW2 = sl(step2, gL)
        parked = parked_l[c]
        act = act_l[c]
        lane = dict(lanes[c])
        holding = lane['holding']
        pool, next_ptr = pools[c], next_ptrs[c]
        n_pool = pool.shape[0]
        ptr0 = next_ptr            # refill-window origin (see below)

        # retire all finished photons of every set with ONE scatter:
        # the pass is dominated by this scatter + the refill gather
        # (profile_poolio: ~60 ns/row scattered), so per-set
        # scatters/gathers are merged
        def fin_cont(g, stepP2, pred):
            fin = pred & (((sl(flags2, g) & TERM) != 0)
                          | (stepP2 >= max_steps))
            idx = jnp.where(fin, sl(idx2, g) - idx_bases[c], n_pool)
            return fin, pred & ~fin, idx

        finA, contA, idxA = fin_cont(0, stepA2, parked)
        doneL = holding & ~act
        finW, contW, idxW = fin_cont(gL, stepW2, doneL)
        ret_idx = [idxA, idxW]
        ret_dat = [packedA, packedW]
        if od_slots == 2:
            packedB = sl(PK2, 1)
            stepB2 = sl(step2, 1)
            parked2 = parked2_l[c]
            finB, contB, idxB = fin_cont(1, stepB2, parked2)
            ret_idx.append(idxB)
            ret_dat.append(packedB)
        pool = pool.at[jnp.concatenate(ret_idx)].set(
            jnp.concatenate(ret_dat, axis=0), mode='drop')

        # spares: one per on-deck slot of origin.  s1 = the photon
        # whose storage is the od1 slot (a surviving parked A, or the
        # unconsumed od1 photon); s2 likewise for od2 (slots=2).
        busy = act
        walk_stay = busy | contW
        walk_free = ~walk_stay
        s1ex = contA | (lane['odk_live'] & ~parked)
        s1p = jnp.where(parked[:, None], packedA, lane['odk_packed'])
        s1s = jnp.where(parked, stepA2, lane['odk_step'])
        if od_slots == 2:
            s2ex = contB | (lane['odk2_live'] & ~parked2)
            s2p = jnp.where(parked2[:, None], packedB,
                            lane['odk2_packed'])
            s2s = jnp.where(parked2, stepB2, lane['odk2_step'])
        else:
            s2ex = jnp.zeros_like(s1ex)
            s2p, s2s = s1p, s1s

        def grab_idx(fill, next_ptr):
            # pool-refill slot indices only — the gathers of every
            # slot pass are merged into ONE pool read below
            rank = jnp.cumsum(fill.astype(jnp.int32)) - 1
            grab = next_ptr + rank
            have = fill & (grab < n_pool)
            src = jnp.clip(grab, 0, n_pool - 1)
            return have, src, \
                next_ptr + jnp.sum(fill.astype(jnp.int32))

        # walking slot: keep -> s1 -> s2 -> pool
        useS1w = walk_free & s1ex
        useS2w = walk_free & ~s1ex & s2ex
        fillw = walk_free & ~s1ex & ~s2ex
        have1, src1, next_ptr = grab_idx(fillw, next_ptr)
        holding_next = walk_stay | useS1w | useS2w | have1

        # od1 slot: first remaining spare -> pool
        s1rem = s1ex & ~useS1w
        s2rem = s2ex & ~useS2w
        use1S1 = s1rem
        use1S2 = s2rem & ~s1rem
        fill1 = holding_next & ~use1S1 & ~use1S2
        have2, src2, next_ptr = grab_idx(fill1, next_ptr)
        odk_live_next = use1S1 | use1S2 | have2
        srcs = [src1, src2]

        if od_slots == 2:
            # od2 slot: remaining spare -> pool (a spare only remains
            # here when od1 took the other one, and pool refill only
            # reaches od2 after od1 was refillable — so od2_live
            # implies od1_live, the kernel cascade's invariant)
            use2S2 = s2rem & ~use1S2
            fill2 = holding_next & odk_live_next & ~use2S2
            have3, src3, next_ptr = grab_idx(fill2, next_ptr)
            srcs.append(src3)

        # STAGED refill (profile_poolio, r5): all grabs land in
        # [ptr0, ptr0 + nsets*w), so fetch that window with ONE
        # contiguous dynamic_slice (28 ns/row vs ~50 for a big-pool
        # row gather) and distribute with a small-operand gather
        # (~30 ns/row).  The slice reads the POST-retire pool so the
        # buffer's liveness stays linear (slicing the pre-retire value
        # would force XLA to copy the pool segment every pass instead
        # of scattering in place); the values are identical either way
        # because every in-flight photon's slot is < ptr0.  Rows with
        # have=False gather garbage inside the window; the have*
        # selects below mask them off.
        WIN = min(nsets * w, n_pool)
        base = jnp.clip(ptr0, 0, n_pool - WIN)
        window = jax.lax.dynamic_slice(pool, (base, 0), (WIN, 16))
        local = jnp.clip(jnp.concatenate(srcs) - base, 0, WIN - 1)
        poolp = window[local]
        poolp1 = jax.lax.slice_in_dim(poolp, 0, w)
        poolp2 = jax.lax.slice_in_dim(poolp, w, 2 * w)

        new_packed = jnp.where(
            walk_stay[:, None], packedW,
            jnp.where(useS1w[:, None], s1p,
                      jnp.where(useS2w[:, None], s2p,
                                jnp.where(have1[:, None], poolp1,
                                          packedW))))
        lane['pk'] = new_packed
        lane['step'] = jnp.where(
            walk_stay, stepW2,
            jnp.where(useS1w, s1s,
                      jnp.where(useS2w, s2s, jnp.zeros_like(stepW2))))
        lane['holding'] = holding_next

        lane['odk_packed'] = jnp.where(
            use1S1[:, None], s1p,
            jnp.where(use1S2[:, None], s2p,
                      jnp.where(have2[:, None], poolp2,
                                lane['odk_packed'])))
        lane['odk_step'] = jnp.where(
            use1S1, s1s, jnp.where(use1S2, s2s, jnp.int32(0)))
        lane['odk_live'] = odk_live_next

        if od_slots == 2:
            poolp3 = jax.lax.slice_in_dim(poolp, 2 * w, 3 * w)
            lane['odk2_packed'] = jnp.where(
                use2S2[:, None], s2p,
                jnp.where(have3[:, None], poolp3,
                          lane['odk2_packed']))
            lane['odk2_step'] = jnp.where(use2S2, s2s, jnp.int32(0))
            lane['odk2_live'] = use2S2 | have3

        # clear the kernel bookkeeping bits; seed the on-deck slots
        # and reseed fresh walks (all predicates from packed views —
        # no SoA unpack)
        lane['W_uregs'] = lane['W_uregs'].at[MP.U_PAD].set(
            jnp.zeros(w, jnp.uint32))
        op = lane['odk_packed']
        ook = lane['odk_live'] & _p_posdir_ok(op)
        od = MP.od_slot_seed(_p_f32(op, 0, 3).T, _p_f32(op, 3, 6).T,
                             _p_i32(op, 13), ook)
        for k, v in od.items():
            lane['W_' + k] = v
        if od_slots == 2:
            o2 = lane['odk2_packed']
            ook2 = lane['odk2_live'] & _p_posdir_ok(o2)
            od2 = MP.od_slot_seed(_p_f32(o2, 0, 3).T,
                                  _p_f32(o2, 3, 6).T,
                                  _p_i32(o2, 13), ook2, slot=2)
            for k, v in od2.items():
                lane['W_' + k] = v
        need = (holding_next & ~busy & _p_posdir_ok(new_packed)
                & (lane['step'] < max_steps))
        lane = _reseed_pallas_from(lane, _p_f32(new_packed, 0, 3).T,
                                   _p_f32(new_packed, 3, 6).T,
                                   _p_i32(new_packed, 13), need, geom)
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
               packed=None, od_slots=1):
    """Initial lane state for one chain: pool photons [lo, lo+w).
    Ondeck lanes store the photon as ONE packed (w, 16) u32 row array
    (key ``pk``) instead of ten SoA keys — the service pass is op-count
    bound, so slot bookkeeping spends one select/concat where the SoA
    layout spent ten; other modes keep the SoA photon keys."""
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
        if ondeck:
            pk = jax.lax.slice_in_dim(packed, lo, lo + w) \
                if packed is not None else _pack(lane)
            lane = dict(pk=pk, **lane_common)
        else:
            lane.update(lane_common)
        lane.update({'W_' + k: v for k, v in W.items()})
        if ondeck:
            # empty on-deck/park slots; the first service pass fills
            # them from the pool
            lane.update({'W_' + k: v
                         for k, v in MP.ondeck_empty(w, od_slots)
                         .items()})
            lane.update(odk_packed=jnp.zeros((w, 16), jnp.uint32),
                        odk_step=jnp.zeros(w, jnp.int32),
                        odk_live=jnp.zeros(w, bool))
            if od_slots == 2:
                lane.update(odk2_packed=jnp.zeros((w, 16), jnp.uint32),
                            odk2_step=jnp.zeros(w, jnp.int32),
                            odk2_live=jnp.zeros(w, bool))
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
                                   'ondeck', 'od_slots'))
def _propagate_fused_packed(state, geom, key, max_steps=100,
                            use_weights=False, scatter_first=0,
                            width=None, service_every=SERVICE_EVERY,
                            chains=None, use_pallas=None, prune=None,
                            service_frac=None, collect_stats=None,
                            ondeck=None, od_slots=None):
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
    # Second on-deck slot: lifts walker utilization 0.73 -> 0.91 at
    # se=17 but pays a third photon set in every service pass — r4
    # head-to-head keeps slots=1 ahead (2.27M vs 2.16M at se=17;
    # slots=2 only wins at stretched windows, 2.20M vs 2.10M at se=22)
    # while the service pass costs ~2.2 ms of a ~3.9 ms window.
    if od_slots is None:
        od_slots = int(os.environ.get('CHROMA_TPU_OD_SLOTS', '1'))
    od_slots = od_slots if ondeck else 1
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

    pools = [jax.lax.slice_in_dim(packed, seg_lo[c], seg_lo[c + 1])
             for c in range(nchains)]
    lanes = [_make_lane(state, geom, seg_lo[c], w_c[c], depth,
                        pal=pal, ondeck=ondeck, od_slots=od_slots,
                        packed=packed if ondeck else None)
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
        # the root's child boxes + count ride into the kernel as
        # broadcast constants: the drain-restart swap seeds the fresh
        # walk's pending set in-kernel (no pre-seeded codes in the
        # per-lane state, no root slab test in the service pass)
        root_lohi = MP.root_boxes_lohi(geom) if ondeck else None
        rcount = (rows[0, mbvh.HDR_KIND]
                  >> jnp.uint32(8)).astype(jnp.int32) if ondeck \
            else None
        wkeys = _w_keys_od(od_slots) if ondeck else _W_KEYS

        def pallas_step(lane):
            W = {k[2:]: lane[k] for k in wkeys}
            ptr = jax.lax.bitcast_convert_type(W['uregs'][MP.U_PTR],
                                               jnp.int32)
            row_t = rows[ptr].T
            W = MP.walk_iter(row_t, W, p_depth, instanced, sq,
                             do_prune=(prune != 'off'),
                             ondeck=ondeck, rbase=rbase,
                             od_slots=od_slots, root_lohi=root_lohi,
                             rcount=rcount)
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
                    # a lane can retire a parked and a live-done
                    # photon (and a second parked one with two on-deck
                    # slots) in one pass, so add, don't OR
                    pad = jax.lax.bitcast_convert_type(
                        lanes[c]['W_uregs'][MP.U_PAD], jnp.int32)
                    ready = ready + jnp.sum((pad & 1) != 0) \
                        .astype(jnp.int32)
                    if od_slots == 2:
                        ready = ready + jnp.sum((pad & 4) != 0) \
                            .astype(jnp.int32)
                stats = stats + jnp.stack(
                    [jnp.asarray(1 if c == 0 else 0, jnp.int32),
                     ready,
                     jnp.sum(holding).astype(jnp.int32) * service_every,
                     jnp.asarray(0, jnp.int32)])
            if ondeck:
                lanes, pools, next_ptrs, keys = _service_ondeck(
                    lanes, pools, next_ptrs, keys, geom, max_steps,
                    scatter_first, use_weights,
                    [int(x) for x in seg_lo[:len(lanes)]],
                    od_slots=od_slots)
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
                    seg_n = pools[c].shape[0]
                    more = active & ((next_ptrs[c] < seg_n)
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
    return jnp.concatenate(pools, axis=0), caller_index, stats


@jax.jit
def _unpack_out(packed, caller_index):
    out = _unpack(packed)
    out['index'] = caller_index
    return out


def propagate_fused(state, geom, key, **kw):
    """Propagate all photons in ``state`` to termination, fused; see
    ``_propagate_fused_packed`` for the driver and every knob.

    The final u32 -> f32 unpack runs in its OWN jit on purpose: fused
    into the driver graph, XLA:TPU canonicalizes subnormal / NaN-
    payload float patterns riding the packed pool words (the round-4
    flush class; referee check 1 catches it).  As a standalone
    bitcast-and-slice kernel the unpack is bit-exact."""
    packed, caller_index, stats = _propagate_fused_packed(
        state, geom, key, **kw)
    return _unpack_out(packed, caller_index), stats
