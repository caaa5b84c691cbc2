"""Packet-BVH pack: collapse the binary LBVH into the table layout the
Pallas packet-traversal kernel consumes.

TPU rationale (measured on v5e, see pallas_traverse.py): Mosaic has no
per-lane gather from VMEM tables, so per-ray SIMT traversal is impossible;
the kernel instead traverses one shared stack per 1024-ray packet, fetching
one node row per step (scalar dynamic slice) and testing it against all
lanes densely. To amortize fetches, leaves are *clusters* of up to K
triangles: every Karras subtree covers a contiguous range of morton-sorted
primitives, so a cluster is just (start, count) into the sorted triangle
table and its fetch is one contiguous slice.

Tables (all padded to TPU-friendly shapes):
- node_f32 [Nt, 16]: left child AABB (6), right child AABB (6), pad
- node_child [Nt, 2] int32: child encoding — >=0: top-tree node id;
  <0: cluster, enc = -(start*256 + count) - 1  (count <= K <= 255)
- tri_f32 [Tp, 16]: v0 (3), e1 (3), e2 (3), original-tri-id as float (1)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.structs import LBVHData, MeshData


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PacketBVH:
    node_f32: jnp.ndarray   # [Nt, 6*arity (padded to lane mult)] f32
    node_child: jnp.ndarray  # [Nt, arity] int32; wide: [Nt, 16] (codes +
    #                          8 per-octant packed order words, cols 8..15)
    tri_f32: jnp.ndarray    # [Tp, 16] f32
    num_nodes: int = field(metadata=dict(static=True), default=0)
    num_triangles: int = field(metadata=dict(static=True), default=0)
    max_cluster: int = field(metadata=dict(static=True), default=8)
    arity: int = field(metadata=dict(static=True), default=2)
    # stream_tris: leave the triangle table in HBM and DMA each cluster
    # slice into VMEM scratch inside the traversal kernel — removes the
    # VMEM ceiling on scene size (the node table stays VMEM-resident: it
    # is ~2% of the triangle table's bytes)
    stream_tris: bool = field(metadata=dict(static=True), default=False)
    # treelet top-tree tables (bvh/treelet.py:attach_treelets) for the
    # self-rebinning kernel (pallas_treelet.py); None = not attached
    top_f32: jnp.ndarray = None      # [Ntop, width] child boxes
    top_child: jnp.ndarray = None    # [Ntop, 16] internal ids + order words
    top_tref: jnp.ndarray = None     # [Ntop, 8] treelet phase-2 root codes
    top_tord: jnp.ndarray = None     # [Ntop, 8] treelet ordinals (sort keys)
    num_top: int = field(metadata=dict(static=True), default=0)
    num_treelets: int = field(metadata=dict(static=True), default=0)
    treelet_max: int = field(metadata=dict(static=True), default=0)


def encode_cluster(start: int, count: int) -> int:
    return -(start * 256 + count) - 1


def decode_cluster(code):
    v = -(code + 1)
    return v // 256, v % 256


def build_packet_bvh(mesh: MeshData, bvh: LBVHData, max_cluster: int = 8
                     ) -> PacketBVH:
    """Host-side collapse (numpy; runs once at scene load)."""
    k = max_cluster
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    prim = np.asarray(bvh.prim_index)
    amin = np.stack([np.asarray(bvh.aabb_min.x), np.asarray(bvh.aabb_min.y),
                     np.asarray(bvh.aabb_min.z)], -1)
    amax = np.stack([np.asarray(bvh.aabb_max.x), np.asarray(bvh.aabb_max.y),
                     np.asarray(bvh.aabb_max.z)], -1)
    total = left.shape[0]
    n = (total + 1) // 2          # leaves
    num_internal = n - 1
    leaf_base = num_internal

    # ---- subtree sorted-prim ranges (bottom-up level propagation) ----------
    lo = np.full(total, -1, np.int64)
    hi = np.full(total, -1, np.int64)
    lo[leaf_base:] = np.arange(n)
    hi[leaf_base:] = np.arange(n)
    lc = np.maximum(left, 0)
    rc = np.maximum(right, 0)
    for _ in range(72):
        new_lo = np.where(np.arange(total) < num_internal,
                          np.minimum(lo[lc], lo[rc]), lo)
        new_hi = np.where(np.arange(total) < num_internal,
                          np.maximum(hi[lc], hi[rc]), hi)
        if np.array_equal(new_lo, lo) and np.array_equal(new_hi, hi):
            break
        lo, hi = new_lo, new_hi
    assert lo[0] == 0 and hi[0] == n - 1, "range propagation did not converge"
    size = hi - lo + 1

    # ---- choose top-tree internals (size > k) -------------------------------
    is_top = (np.arange(total) < num_internal) & (size > k)
    top_ids = np.nonzero(is_top)[0]
    remap = np.full(total, -1, np.int64)
    remap[top_ids] = np.arange(top_ids.size)

    def child_code(c: int) -> int:
        if c < num_internal and is_top[c]:
            return int(remap[c])
        # cluster leaf: contiguous sorted range, possibly split into <=k chunks
        return encode_cluster(int(lo[c]), int(size[c]))

    if top_ids.size == 0:
        # tiny scene: fabricate one root splitting prims in two clusters
        half = max(1, n // 2)
        nodes_f32 = np.zeros((1, 16), np.float32)
        nodes_f32[0, 0:3] = amin[0] - 1e-3
        nodes_f32[0, 3:6] = amax[0] + 1e-3
        nodes_f32[0, 6:9] = amin[0] - 1e-3
        nodes_f32[0, 9:12] = amax[0] + 1e-3
        node_child = np.array(
            [[encode_cluster(0, half), encode_cluster(half, n - half)]],
            np.int32)
    else:
        nt = top_ids.size
        nodes_f32 = np.zeros((nt, 16), np.float32)
        node_child = np.zeros((nt, 2), np.int32)
        l_of = left[top_ids]
        r_of = right[top_ids]
        nodes_f32[:, 0:3] = amin[l_of]
        nodes_f32[:, 3:6] = amax[l_of]
        nodes_f32[:, 6:9] = amin[r_of]
        nodes_f32[:, 9:12] = amax[r_of]
        for t_i, (lc_i, rc_i) in enumerate(zip(l_of, r_of)):
            node_child[t_i, 0] = child_code(int(lc_i))
            node_child[t_i, 1] = child_code(int(rc_i))
        # note: remap preserves original order and original root==0 is top
        # (size[0] == n > k), so top root is node 0.

    # clusters larger than k: split ranges into k-sized chunks by rewriting
    # the encoding at traversal time is not possible, so split here by
    # chaining: encode only up to 255 and let the kernel loop count times in
    # chunks of k. (count fits 8 bits; k <= count <= 255 handled in-kernel.)
    assert np.all(size[~is_top & (np.arange(total) < num_internal)] <= 255), \
        "cluster too large for 8-bit count; raise max_cluster"

    # ---- sorted triangle table ---------------------------------------------
    sorted_prims = prim[leaf_base:]
    if bvh.num_triangles < mesh.num_triangles:
        raise ValueError("bvh does not cover mesh")
    p0 = np.stack([np.asarray(mesh.positions.x), np.asarray(mesh.positions.y),
                   np.asarray(mesh.positions.z)], -1)
    i0 = np.asarray(mesh.i0)[sorted_prims % mesh.num_triangles]
    i1 = np.asarray(mesh.i1)[sorted_prims % mesh.num_triangles]
    i2 = np.asarray(mesh.i2)[sorted_prims % mesh.num_triangles]
    v0 = p0[i0]
    e1 = p0[i1] - v0
    e2 = p0[i2] - v0
    # pad so any cluster slice [start, start+k) stays in bounds
    tp = int(np.ceil((n + k) / 8) * 8)
    tri_f32 = np.zeros((tp, 16), np.float32)
    tri_f32[:n, 0:3] = v0
    tri_f32[:n, 3:6] = e1
    tri_f32[:n, 6:9] = e2
    tri_f32[:n, 9] = (sorted_prims % mesh.num_triangles).astype(np.float32)
    # padding rows: degenerate (e1=e2=0 -> det==0 -> never hit)

    return PacketBVH(
        node_f32=jnp.asarray(nodes_f32),
        node_child=jnp.asarray(node_child),
        tri_f32=jnp.asarray(tri_f32),
        num_nodes=int(nodes_f32.shape[0]),
        num_triangles=int(n),
        max_cluster=k,
        arity=2,
    )


def build_packet_bvh_wide(mesh: MeshData, bvh: LBVHData,
                          max_cluster: int = 16, arity: int = 4
                          ) -> PacketBVH:
    """Collapse the binary top tree into an `arity`-wide packet BVH with
    per-octant static child orderings.

    TPU rationale: the packet kernel's step cost is dominated by a serial
    fetch->test->reduce chain, so each step should cover as much tree as
    possible — one row fetch tests `arity` child boxes. Traversal order
    comes from a host-precomputed table (slots sorted by child-box center
    along each octant direction, 4 bits/slot packed into one int32 per
    octant) instead of a per-step packet-min reduce: after the coherence
    sort all rays of a packet share an octant, so direction-sign ordering
    is the classic BVH near-child heuristic at zero vector-lane cost.

    Layouts:
    - node_f32 [Nt, ceil(6*arity/8)*8]: child s box at cols [6s, 6s+6)
      (empty slots get inverted boxes — never hit)
    - node_child [Nt, 16]: cols [0, arity) child codes (>=0 wide-node id,
      <0 cluster code as in build_packet_bvh, -1 empty), cols [8, 16) the
      8 packed octant order words
    - tri_f32: as build_packet_bvh
    """
    assert arity in (4, 8)
    base = build_packet_bvh(mesh, bvh, max_cluster=max_cluster)
    b_f32 = np.asarray(base.node_f32)
    b_child = np.asarray(base.node_child)

    def child_box(i, side):
        return b_f32[i, 6 * side:6 * side + 6]

    # widen: starting at a kept binary node, greedily expand the internal
    # slot with the largest surface area until `arity` slots (or all
    # slots are clusters)
    def area(box):
        d = np.maximum(box[3:6] - box[0:3], 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    from collections import deque

    remap = {}
    order = []
    queue = deque([0])
    rows = []
    while queue:
        i = queue.popleft()
        if i in remap:
            continue
        remap[i] = len(order)
        order.append(i)
        # slots: list of (kind, binary_id_or_code, box)
        slots = [(("node", int(b_child[i, s])) if b_child[i, s] >= 0
                  else ("cluster", int(b_child[i, s])), child_box(i, s))
                 for s in (0, 1)]
        while len(slots) < arity:
            # expand largest-area internal slot
            best, best_a = -1, -1.0
            for si, ((kind, c), box) in enumerate(slots):
                if kind == "node":
                    a = area(box)
                    if a > best_a:
                        best, best_a = si, a
            if best < 0:
                break
            (kind, c), _ = slots.pop(best)
            for s in (0, 1):
                cc = int(b_child[c, s])
                slots.insert(best + s,
                             (("node", cc) if cc >= 0 else ("cluster", cc),
                              child_box(c, s)))
        for (kind, c), _ in slots:
            if kind == "node":
                queue.append(c)
        rows.append(slots)

    nt = len(order)
    width = ((6 * arity + 7) // 8) * 8
    # empty slots: a point box at +3e38 on every axis — the min/max slab
    # test can never pass it (an "inverted" box would be re-normalized by
    # the per-axis min/max and spuriously hit)
    node_f32 = np.full((nt, width), 3e38, np.float32)
    node_child = np.full((nt, 16), -1, np.int32)

    oct_dirs = np.array([[1.0 if o & 4 else -1.0,
                          1.0 if o & 2 else -1.0,
                          1.0 if o & 1 else -1.0] for o in range(8)])

    for row, slots in enumerate(rows):
        centers = []
        for s, ((kind, c), box) in enumerate(slots):
            node_f32[row, 6 * s:6 * s + 6] = box
            node_child[row, s] = remap[c] if kind == "node" else c
            centers.append(0.5 * (box[0:3] + box[3:6]))
        # unused slots keep the pre-filled far point boxes and code -1
        cen = np.asarray(centers)
        for o in range(8):
            # ascending entry distance along the octant direction
            proj = cen @ oct_dirs[o]
            ordr = list(np.argsort(proj, kind="stable"))
            ordr += [s for s in range(arity) if s >= len(slots)]
            packed = 0
            for pos, s in enumerate(ordr):
                packed |= (int(s) & 15) << (4 * pos)
            node_child[row, 8 + o] = np.int32(np.uint32(packed).view(np.int32))

    return PacketBVH(
        node_f32=jnp.asarray(node_f32),
        node_child=jnp.asarray(node_child),
        tri_f32=base.tri_f32,
        num_nodes=nt,
        num_triangles=base.num_triangles,
        max_cluster=max_cluster,
        arity=arity,
    )


def align_clusters_for_stream(pack: PacketBVH) -> PacketBVH:
    """Rewrite a wide pack's triangle table into the HBM-streaming layout:
    every cluster gets its own 8-aligned K-row slot and the table is
    lane-packed to [rows, 128] (8 triangle rows of 16 f32 per 128-lane
    row). TPU rationale: a DMA slice must be 128-aligned in the lane
    dimension, so the resident [T, 16] layout cannot be streamed (Mosaic:
    "Slice shape along dimension 1 must be aligned to tiling (128)") —
    and aligning each cluster start to a multiple of 8 keeps the
    in-kernel per-triangle scalar extracts at static offsets. Costs
    ~1.3-1.6x triangle-table bytes (count < K slots are padded with
    degenerate rows), paid in HBM where the ceiling is ~16 GB, to lift
    the ~12 MB VMEM-resident ceiling."""
    import dataclasses

    k = pack.max_cluster
    assert k * 16 % 128 == 0 or k % 8 == 0, "need 8-aligned cluster slots"
    assert pack.arity > 2, "streaming layout is a wide-kernel feature"
    child = np.asarray(pack.node_child).copy()
    tri = np.asarray(pack.tri_f32)
    codes = child[:, :pack.arity]
    is_cluster = codes <= -2  # -1 = empty slot
    vals = -(codes + 1)
    starts = vals // 256
    counts = vals % 256

    uniq = sorted({(int(s), int(c))
                   for s, c in zip(starts[is_cluster], counts[is_cluster])})
    new_start = {}
    cursor = 0
    for s, c in uniq:
        new_start[(s, c)] = cursor
        cursor += k
    rows = max(cursor * 16 // 128, 1)
    new_tri = np.zeros((cursor if cursor else 8, 16), np.float32)
    for (s, c), ns in new_start.items():
        new_tri[ns:ns + c] = tri[s:s + c]

    new_codes = codes.copy()
    it = np.nonzero(is_cluster)
    for r, s in zip(*it):
        key = (int(starts[r, s]), int(counts[r, s]))
        new_codes[r, s] = encode_cluster(new_start[key], key[1])
    child[:, :pack.arity] = new_codes

    return dataclasses.replace(
        pack,
        node_child=jnp.asarray(child),
        tri_f32=jnp.asarray(new_tri.reshape(rows, 128)),
        stream_tris=True,
    )
