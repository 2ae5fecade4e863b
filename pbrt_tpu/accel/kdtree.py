"""Kd-tree accelerator (API parity with `Accelerator "kdtree"`).

TPU re-expression of accelerators/kdtreeaccel.{h,cpp}: the 8-byte packed
KdAccelNode + recursive SAH build (kdtreeaccel.cpp:119-260) happens host-side
in numpy/python at scene compile; traversal is a lockstep wavefront loop
(KdToDo stack, kdtreeaccel.cpp:415-480) mirroring the BVH 'if-if' harness in
accel/traverse.py, with a (node, tmin, tmax) stack per lane.

Node layout (kd_nodes [M, 4] f32):
  interior: [split_pos, axis (0/1/2), above_child, 0]
  leaf:     [prim_offset, 3, n_prims, 0]
Prim ids for leaves are concatenated in kd_prim_ids [K] i32 (indices into
the global primitive records, same ids the BVH leaves use).

The BVH remains the default accelerator (api.cpp:172); the kd-tree build is
pure Python and meant for API-parity scenes, not the >100k-prim hot path
(the native C++ builder port is a later milestone).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import vecmath as vm

ISECT_COST = 80.0
TRAV_COST = 1.0
EMPTY_BONUS = 0.5
MAX_PRIMS_LEAF = 1
STACK_DEPTH = 64


def build_kdtree(bmin: np.ndarray, bmax: np.ndarray, max_prims: int = MAX_PRIMS_LEAF):
    """SAH kd-tree over primitive bounds (kdtreeaccel.cpp:119-260 semantics:
    sorted bound-edge sweep, empty bonus, bad-refine cutoff).

    Returns (kd_nodes [M,4] f32, kd_prim_ids [K] i32, wb_min [3], wb_max [3]).
    """
    n = bmin.shape[0]
    max_depth = int(round(8 + 1.3 * np.log2(max(n, 2))))
    nodes = []
    prim_ids = []
    wb_min = bmin.min(0).astype(np.float32)
    wb_max = bmax.max(0).astype(np.float32)

    def make_leaf(prims):
        nodes.append([float(len(prim_ids)), 3.0, float(len(prims)), 0.0])
        prim_ids.extend(int(p) for p in prims)

    def rec(prims, nb0, nb1, depth, bad_refines):
        if len(prims) <= max_prims or depth == 0:
            make_leaf(prims)
            return
        # SAH split search over the largest-extent axis, retrying the other
        # axes on failure (kdtreeaccel.cpp:176-232).
        d = nb1 - nb0
        inv_total_sa = 1.0 / max(
            2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0]), 1e-12
        )
        old_cost = ISECT_COST * len(prims)
        best_cost, best_axis, best_split = np.inf, -1, -1.0
        axis = int(np.argmax(d))
        for attempt in range(3):
            a = (axis + attempt) % 3
            lo = bmin[prims, a]
            hi = bmax[prims, a]
            # Edge events: (t, is_end) sorted by (t, start<end ties: start
            # first per pbrt's comparator placing starts before ends).
            ts = np.concatenate([lo, hi])
            kind = np.concatenate(
                [np.zeros(len(prims)), np.ones(len(prims))]
            )  # 0=start, 1=end
            order = np.lexsort((kind, ts))
            ts_s = ts[order]
            kind_s = kind[order]
            n_below = 0
            n_above = len(prims)
            o1, o2 = (a + 1) % 3, (a + 2) % 3
            for i in range(len(ts_s)):
                if kind_s[i] == 1:
                    n_above -= 1
                t = ts_s[i]
                if nb0[a] < t < nb1[a]:
                    below_sa = 2.0 * (
                        d[o1] * d[o2] + (t - nb0[a]) * (d[o1] + d[o2])
                    )
                    above_sa = 2.0 * (
                        d[o1] * d[o2] + (nb1[a] - t) * (d[o1] + d[o2])
                    )
                    pb = below_sa * inv_total_sa
                    pa = above_sa * inv_total_sa
                    eb = EMPTY_BONUS if (n_above == 0 or n_below == 0) else 0.0
                    cost = TRAV_COST + ISECT_COST * (1.0 - eb) * (
                        pb * n_below + pa * n_above
                    )
                    if cost < best_cost:
                        best_cost, best_axis, best_split = cost, a, t
                if kind_s[i] == 0:
                    n_below += 1
            if best_axis >= 0:
                break
        if best_cost > old_cost:
            bad_refines += 1
        if (
            best_axis < 0
            or (best_cost > 4.0 * old_cost and len(prims) < 16)
            or bad_refines == 3
        ):
            make_leaf(prims)
            return
        below = [p for p in prims if bmin[p, best_axis] < best_split]
        above = [p for p in prims if bmax[p, best_axis] > best_split]
        # Flat prims lying exactly on the plane go below (start<split fails,
        # end>split fails -> would vanish); keep them in both or below.
        flat = [
            p for p in prims
            if bmin[p, best_axis] >= best_split and bmax[p, best_axis] <= best_split
        ]
        below.extend(flat)
        my_idx = len(nodes)
        nodes.append(None)  # patched after below-subtree emission
        b0b, b1b = nb0.copy(), nb1.copy()
        b1b[best_axis] = best_split
        rec(below, b0b, b1b, depth - 1, bad_refines)
        above_child = len(nodes)
        nodes[my_idx] = [float(best_split), float(best_axis), float(above_child), 0.0]
        b0a, b1a = nb0.copy(), nb1.copy()
        b0a[best_axis] = best_split
        rec(above, b0a, b1a, depth - 1, bad_refines)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(10000 + 4 * max_depth * 64)
    try:
        rec(list(range(n)), wb_min.astype(np.float64), wb_max.astype(np.float64),
            max_depth, 0)
    finally:
        sys.setrecursionlimit(old_limit)
    return (
        np.asarray(nodes, np.float32),
        np.asarray(prim_ids if prim_ids else [0], np.int32),
        wb_min,
        wb_max,
    )


def traverse_kd(scene, o, d, t_max, quadric_types, any_hit: bool):
    """Lockstep kd traversal (KdTreeAccel::Intersect, kdtreeaccel.cpp:415):
    each live lane advances one node visit OR one leaf-prim test per
    iteration; (node, tmin, tmax) stack in [N, D] arrays."""
    from . import traverse as tv

    n = o.shape[0]
    inv_d = 1.0 / jnp.where(d == 0.0, 1e-30, d)

    # Ray vs world bounds (kdtreeaccel.cpp:418-421).
    wb0 = scene.kd_wb_min
    wb1 = scene.kd_wb_max
    t0 = (wb0 - o) * inv_d
    t1 = (wb1 - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf_ = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tmin0 = jnp.maximum(tn, 0.0)
    tmax0 = jnp.minimum(tf_, t_max_arr)
    hit_box = tmin0 <= tmax0

    state = dict(
        node=jnp.where(hit_box, 0, -1),
        tmin=tmin0,
        tmax=tmax0,
        sp=jnp.zeros((n,), jnp.int32),
        st_node=jnp.zeros((n, STACK_DEPTH), jnp.int32),
        st_tmin=jnp.zeros((n, STACK_DEPTH), jnp.float32),
        st_tmax=jnp.zeros((n, STACK_DEPTH), jnp.float32),
        leaf_cur=jnp.zeros((n,), jnp.int32),
        leaf_end=jnp.zeros((n,), jnp.int32),
        t_best=t_max_arr,
        prim_best=jnp.full((n,), -1, jnp.int32),
    )
    slot_iota = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]

    def alive(s):
        live = (s["node"] >= 0) | (s["leaf_cur"] < s["leaf_end"])
        if any_hit:
            live = live & (s["prim_best"] < 0)
        return live

    def cond(s):
        return jnp.any(alive(s))

    def body(s):
        live = alive(s)
        in_leaf = live & (s["leaf_cur"] < s["leaf_end"])
        at_node = live & ~in_leaf & (s["node"] >= 0)

        # ---- leaf-prim step (one prim per iteration, shared with BVH) ----
        pid = scene.kd_prim_ids[
            jnp.clip(s["leaf_cur"], 0, scene.kd_prim_ids.shape[0] - 1)
        ]
        p_hit, p_t = tv._test_prim(scene, pid, o, d, s["t_best"], quadric_types)
        take = in_leaf & p_hit & (p_t < s["t_best"])
        t_best = jnp.where(take, p_t, s["t_best"])
        prim_best = jnp.where(take, pid, s["prim_best"])
        leaf_cur = jnp.where(in_leaf, s["leaf_cur"] + 1, s["leaf_cur"])

        # ---- node step ----
        nd = jnp.clip(s["node"], 0, scene.kd_nodes.shape[0] - 1)
        row = scene.kd_nodes[nd]
        axis = row[..., 1].astype(jnp.int32)
        is_leaf = axis == 3
        split = row[..., 0]
        above = row[..., 2].astype(jnp.int32)

        # Early exit: closest hit already before this node's tmin
        # (kdtreeaccel.cpp:441 "if (ray.tMax < tMin) break").
        dead_node = at_node & (t_best < s["tmin"])
        enter_leaf = at_node & is_leaf & ~dead_node
        off = split.astype(jnp.int32)
        npr = above
        real_leaf = enter_leaf & (npr > 0)
        empty_leaf = enter_leaf & (npr == 0)  # SAH emits empty leaves
        leaf_cur = jnp.where(real_leaf, off, leaf_cur)
        leaf_end = jnp.where(real_leaf, off + npr, s["leaf_end"])

        interior = at_node & ~is_leaf & ~dead_node
        ax = jnp.clip(axis, 0, 2)
        o_a = vm.component3(o, ax)
        inv_a = vm.component3(inv_d, ax)
        t_plane = (split - o_a) * inv_a
        below_first = (o_a < split) | ((o_a == split) & (
            vm.component3(d, ax) <= 0.0
        ))
        first = jnp.where(below_first, nd + 1, above)
        second = jnp.where(below_first, above, nd + 1)
        one_child = (t_plane > s["tmax"]) | (t_plane <= 0.0)
        only_second = t_plane < s["tmin"]
        push = interior & ~one_child & ~only_second

        spc = jnp.clip(s["sp"], 0, STACK_DEPTH - 1)
        wm = push[:, None] & (slot_iota == spc[:, None])
        st_node = jnp.where(wm, second[:, None], s["st_node"])
        st_tmin = jnp.where(wm, t_plane[:, None], s["st_tmin"])
        st_tmax = jnp.where(wm, s["tmax"][:, None], s["st_tmax"])
        sp = s["sp"] + push.astype(jnp.int32)

        node_int = jnp.where(
            one_child, first, jnp.where(only_second, second, first)
        )
        tmax_int = jnp.where(push, t_plane, s["tmax"])

        # ---- pop (after a leaf entry, a dead node, or leaf completion) ----
        # A lane needs a pop when it just entered a leaf (next iteration
        # drains prims; node parked at -2 meanwhile), finished its leaf, or
        # its node was culled.
        finished_leaf = in_leaf & (leaf_cur >= leaf_end) & (s["node"] == -2)
        can_pop = sp > 0
        spp = jnp.clip(sp - 1, 0, STACK_DEPTH - 1)
        popped_n = jnp.take_along_axis(st_node, spp[:, None], 1)[:, 0]
        popped_t0 = jnp.take_along_axis(st_tmin, spp[:, None], 1)[:, 0]
        popped_t1 = jnp.take_along_axis(st_tmax, spp[:, None], 1)[:, 0]

        node = jnp.where(
            interior, node_int,
            jnp.where(real_leaf, -2, s["node"]),  # park while draining leaf
        )
        # Early-exit lanes terminate outright: kd traversal pops strictly
        # front-to-back, so every remaining stack entry is farther
        # (kdtreeaccel.cpp:441 breaks the whole loop).
        do_pop = finished_leaf | empty_leaf
        node = jnp.where(do_pop, jnp.where(can_pop, popped_n, -1), node)
        node = jnp.where(dead_node, -1, node)
        tmin = jnp.where(do_pop & can_pop, popped_t0, s["tmin"])
        tmax = jnp.where(do_pop & can_pop, popped_t1, tmax_int)
        tmin = jnp.where(interior & ~push, s["tmin"], tmin)
        sp = jnp.where(do_pop & can_pop, sp - 1, sp)
        sp = jnp.where(dead_node, 0, sp)

        return dict(
            node=node, tmin=tmin, tmax=tmax, sp=sp,
            st_node=st_node, st_tmin=st_tmin, st_tmax=st_tmax,
            leaf_cur=leaf_cur, leaf_end=leaf_end,
            t_best=t_best, prim_best=prim_best,
        )

    out = jax.lax.while_loop(cond, body, state)
    return jax.lax.stop_gradient(out["t_best"]), out["prim_best"]
