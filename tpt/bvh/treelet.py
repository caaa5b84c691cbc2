"""Treelet cut of the wide packet BVH — host-side tables for the
self-rebinning traversal kernel (bvh/pallas_treelet.py).

Why (measured, BENCHMARKS.md §1/§4): the wide packet kernel charges every
lane of a 2048-ray super-packet for the packet's node-visit UNION, and for
incoherent bounce rays that union approaches the whole tree — frames are
~85% extension cast at 3.2 Mrays/s. The reference's per-ray MIMD traversal
(/root/reference/src/kernels/ray_cast.cu:12-122) gets divergence for free;
the TPU-native answer is packet-level MIMD over subtrees: cut the BVH into
treelets of <= max_tris triangles, have each lane nominate the few treelets
its ray actually enters (nearest-first), and traverse each requested
subtree once per packet — the per-visit dense work then scales with
per-treelet unions instead of the whole-tree union.

The cut produces a TOP TREE over the existing wide-node table:
- top nodes = wide nodes whose subtree holds > max_tris triangles (the
  node ids are re-indexed BFS so the top root is row 0);
- a top node's child slot is either another top node (internal) or a
  treelet reference whose "phase-2 code" is the wide-table child code
  itself (>= 0: wide node id, < 0: cluster code) — so treelet subtrees
  reuse the packet tables unchanged and need no duplication.

Everything here runs once at scene build (numpy).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

import jax
import numpy as np
import jax.numpy as jnp

from .pack import PacketBVH, decode_cluster


def subtree_sizes(pack: PacketBVH) -> np.ndarray:
    """Triangles under each wide node. Children have larger BFS ids than
    their parent (build_packet_bvh_wide assigns ids at queue-pop), so one
    reverse sweep suffices."""
    child = np.asarray(pack.node_child)
    nt = child.shape[0]
    size = np.zeros(nt, np.int64)
    arity = pack.arity
    for i in range(nt - 1, -1, -1):
        s = 0
        for c in child[i, :arity]:
            c = int(c)
            if c == -1:
                continue
            if c >= 0:
                s += size[c]
            else:
                s += decode_cluster(c)[1]
        size[i] = s
    return size


def attach_treelets(pack: PacketBVH, max_tris: int = 1024) -> PacketBVH:
    """Return `pack` with top-tree tables attached (PacketBVH.top_*)."""
    assert pack.arity > 2, "treelet cut is a wide-pack feature"
    child = np.asarray(pack.node_child)
    nodes = np.asarray(pack.node_f32)
    arity = pack.arity
    size = subtree_sizes(pack)

    if size[0] <= max_tris:
        # whole scene fits one treelet: a single pseudo top node whose only
        # slot is a treelet ref covering the wide root. Its box = union of
        # the root's child boxes.
        width = nodes.shape[1]
        top_f32 = np.full((1, width), 3.0e38, np.float32)
        lo = np.full(3, np.inf, np.float32)
        hi = np.full(3, -np.inf, np.float32)
        for s in range(arity):
            if int(child[0, s]) == -1:
                continue
            box = nodes[0, 6 * s:6 * s + 6]
            lo = np.minimum(lo, box[0:3])
            hi = np.maximum(hi, box[3:6])
        top_f32[0, 0:3] = lo
        top_f32[0, 3:6] = hi
        top_child = np.full((1, 16), -1, np.int32)
        top_child[0, 8:16] = 0x76543210  # identity order words
        top_tref = np.zeros((1, 8), np.int32)
        top_tref[0, 0] = 0  # wide root node id
        top_tord = np.zeros((1, 8), np.int32)
        return dataclasses.replace(
            pack, top_f32=jnp.asarray(top_f32),
            top_child=jnp.asarray(top_child),
            top_tref=jnp.asarray(top_tref),
            top_tord=jnp.asarray(top_tord),
            num_top=1, num_treelets=1, treelet_max=int(max_tris))

    is_top = size > max_tris
    top_ids = np.nonzero(is_top)[0]
    remap = np.full(child.shape[0], -1, np.int64)
    remap[top_ids] = np.arange(top_ids.size)
    assert remap[0] == 0, "wide root must stay top row 0"

    ntop = top_ids.size
    width = nodes.shape[1]
    top_f32 = nodes[top_ids].copy()
    top_child = np.full((ntop, 16), -1, np.int32)
    top_child[:, 8:16] = child[top_ids, 8:16]  # octant order words (same boxes)
    top_tref = np.zeros((ntop, 8), np.int32)
    # ordinal per treelet (dense small ints for coherence-sort keys): BFS
    # emission order, which follows the wide tree's spatial layout
    top_tord = np.zeros((ntop, 8), np.int32)

    n_treelets = 0
    for r, i in enumerate(top_ids):
        for s in range(arity):
            c = int(child[i, s])
            if c == -1:
                continue  # empty slot: box never hits; tref stays 0 unused
            if c >= 0 and is_top[c]:
                top_child[r, s] = remap[c]
            else:
                # treelet ref: phase-2 root code = the wide-table code
                top_tref[r, s] = c
                top_tord[r, s] = n_treelets
                n_treelets += 1

    return dataclasses.replace(
        pack, top_f32=jnp.asarray(top_f32),
        top_child=jnp.asarray(top_child), top_tref=jnp.asarray(top_tref),
        top_tord=jnp.asarray(top_tord),
        num_top=int(ntop), num_treelets=int(n_treelets),
        treelet_max=int(max_tris))


# ---------------------------------------------------------------------------
# Dense-sweep tables (bvh/pallas_sweep.py)
# ---------------------------------------------------------------------------

# pad-box sentinel: lo = hi = +INF provably fails the slab test for every
# direction-sign combination (matches pallas_sweep dense_scan's padding)
_GINF = 3.0e38

@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SweepTables:
    """Per-treelet contiguous triangle ranges, repacked so every treelet's
    range starts on an `unroll`-row boundary and spans a whole number of
    `unroll`-row chunks (pad rows are degenerate e1=e2=0 triangles that
    can never hit). ranges[t] = (row_start, num_chunks)."""
    tri_f32: jnp.ndarray            # [rows_padded, 16] f32
    ranges: jnp.ndarray             # [num_treelets, 2] int32
    boxes: jnp.ndarray              # [num_treelets, 8] f32 aabb lo3/hi3/pad
    # 8 sub-AABBs per treelet, one per group of `chunk_align` chunks
    # (= one kernel fori trip at unroll == chunk_align): lo3/hi3/pad2.
    # Pad groups carry lo = hi = +INF (slab-test provably fails, same
    # convention as dense_scan's box padding). Lets the sweep kernel trim
    # its per-treelet trip window to [first, last] hit groups
    # (pallas_sweep group culling) — valid when max_chunks <= 8*chunk_align.
    group_boxes: jnp.ndarray = None  # [num_treelets*8, 8] f32
    num_treelets: int = field(metadata=dict(static=True), default=0)
    max_chunks: int = field(metadata=dict(static=True), default=0)
    unroll: int = field(metadata=dict(static=True), default=8)
    chunk_align: int = field(metadata=dict(static=True), default=4)


def _treelet_ranges(pack: PacketBVH):
    """Per-treelet (aabb[6], tri_start, tri_count) in packed-table rows.
    Every treelet subtree covers one contiguous range of the packed
    triangle table (subtrees of both the LBVH collapse and the native SAH
    build emit leaves depth-first) — asserted here."""
    top_child = np.asarray(pack.top_child)
    top_tref = np.asarray(pack.top_tref)
    top_tord = np.asarray(pack.top_tord)
    top_f32 = np.asarray(pack.top_f32)
    child = np.asarray(pack.node_child)
    arity = pack.arity

    def subtree_range(code):
        ranges = []
        stack = [int(code)]
        while stack:
            c = stack.pop()
            if c < 0:
                s, n = decode_cluster(c)
                ranges.append((s, n))
            else:
                for cc in child[c, :arity]:
                    if int(cc) != -1:
                        stack.append(int(cc))
        ranges.sort()
        for i in range(len(ranges) - 1):
            assert ranges[i][0] + ranges[i][1] == ranges[i + 1][0], \
                "treelet subtree is not a contiguous triangle range"
        return ranges[0][0], sum(n for _, n in ranges)

    T = pack.num_treelets
    boxes = np.zeros((T, 6), np.float32)
    start = np.zeros(T, np.int64)
    count = np.zeros(T, np.int64)
    for r in range(top_child.shape[0]):
        for s in range(arity):
            if top_child[r, s] != -1:
                continue
            code = int(top_tref[r, s])
            if code == 0:  # empty slot (wide node 0 is always top)
                continue
            t = int(top_tord[r, s])
            boxes[t] = top_f32[r, 6 * s:6 * s + 6]
            start[t], count[t] = subtree_range(code)
    return boxes, start, count


def sweep_tables(pack: PacketBVH, unroll: int = 8,
                 chunk_align: int = 4) -> SweepTables:
    """Build the dense-sweep tables from an attach_treelets() pack.
    Per-treelet chunk counts are rounded up to `chunk_align` so the
    sublane-parallel kernel (pallas_sweep.sweep8_closest_hit) can unroll
    that many chunks per fori iteration without cross-treelet overrun;
    pad rows are all-zero degenerate triangles (det = 0, never hit)."""
    assert pack.num_treelets > 0, "run attach_treelets() first"
    boxes, start, count = _treelet_ranges(pack)
    tri = np.asarray(pack.tri_f32)
    T = pack.num_treelets
    chunks = (count + unroll - 1) // unroll
    chunks = (chunks + chunk_align - 1) // chunk_align * chunk_align
    row_start = np.zeros(T, np.int64)
    total = 0
    for t in range(T):
        row_start[t] = total
        total += chunks[t] * unroll
    out = np.zeros((max(total, unroll), tri.shape[1]), np.float32)
    for t in range(T):
        out[row_start[t]:row_start[t] + count[t]] = (
            tri[start[t]:start[t] + count[t]])
    ranges = np.stack([row_start, chunks], -1).astype(np.int32)
    boxes8 = np.zeros((T, 8), np.float32)
    boxes8[:, :6] = boxes

    # group sub-AABBs: 8 slots per treelet, slot g covering chunks
    # [g*chunk_align, (g+1)*chunk_align) — i.e. one unroll trip of the
    # sweep kernel. Computed from the REAL triangle rows only (pad rows
    # are all-zero and would pull every box to the origin); pad/empty
    # groups keep lo = hi = +INF so the kernel's slab test provably
    # fails for them. Slightly inflated (1e-6 relative) so fp rounding
    # in the slab reciprocals can never cull a true MT hit.
    G = 8
    gbox = np.zeros((T * G, 8), np.float32)
    gbox[:, :6] = _GINF
    rows_per_group = chunk_align * unroll
    for t in range(T):
        for g in range(min(G, int(chunks[t]) // chunk_align)):
            r0 = int(row_start[t]) + g * rows_per_group
            r1 = min(r0 + rows_per_group, int(row_start[t]) + int(count[t]))
            if r1 <= r0:
                continue
            rows = out[r0:r1]
            v0 = rows[:, 0:3]
            verts = np.concatenate(
                [v0, v0 + rows[:, 3:6], v0 + rows[:, 6:9]], axis=0)
            lo, hi = verts.min(0), verts.max(0)
            # coordinate-relative inflation; f32 slab rounding actually
            # scales with |origin - box|, so a distant grazing ray can in
            # principle be culled — the same precision class as the
            # UN-inflated dense_scan treelet boxes (scan entry-t feeds the
            # demand mask), so group culling adds no new tolerance
            pad = 1e-6 * np.maximum(np.abs(lo), np.abs(hi)) + 1e-30
            gbox[t * G + g, :3] = lo - pad
            gbox[t * G + g, 3:6] = hi + pad

    return SweepTables(
        tri_f32=jnp.asarray(out), ranges=jnp.asarray(ranges),
        boxes=jnp.asarray(boxes8), group_boxes=jnp.asarray(gbox),
        num_treelets=T,
        max_chunks=int(chunks.max()), unroll=unroll,
        chunk_align=chunk_align)
