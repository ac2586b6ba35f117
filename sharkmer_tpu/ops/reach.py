"""Depth-capped reachability prefetch and rc-indexed primer scans.

The sPCR graph extension is a host-driven BFS that issues one small
candidate-count lookup batch per wave (pcr/graph.py). On the deployment
target a synchronous device round-trip costs ~25 ms, so per-wave device
lookups are hopeless (a 1.8 kb amplicon is ~1800 waves), and a full
host mirror of the table pays a multi-second device->host export (the
tunneled link moves ~13 MB/s) before the first wave.

Both costs disappear if the device ships only the rows the walk can
ever touch. ``reach`` runs the whole expansion *inside one jitted
``lax.while_loop``*: starting from the host's current wave candidates,
it repeatedly expands every hit k-mer to its 8 de Bruijn neighbours
(4 suffix-shifts + 4 prefix-shifts — exactly the candidate set the
host enumerates per node per direction, graph.rs:417-430), keeps hits
with count >= the step threshold, and returns the visited rows. The
host then serves waves from that result:

* a hit in the result is the exact table count;
* a miss within ``depth`` waves of the prefetch is proven absent
  (below threshold): the closure is a superset of everything the host
  walk can query, because the host adds nodes only for candidates at
  or above the step threshold, and its high-coverage skip and node
  budget only *shrink* the explored region;
* when the closure ran to quiescence (frontier emptied) misses are
  trusted for the rest of the walk — the common case: one device call
  covers an entire gene x threshold step.

The device is a pure cache warmer; extension *semantics* (thresholds,
medians, coverage skip, budget, meet-in-the-middle) stay byte-exact on
host.

Lookup structure: TPU random gathers run at ~14M elem/s, so the
in-loop table probe must touch O(1) scattered locations per candidate.
Binary search over a 2^25-row partition costs 25 scattered gathers
(measured 10.7 ms per loop iteration — unusable). Instead each
partition gets a one-time *bucket LUT* sidecar: ``lut[b]`` = first row
whose key's top B bits equal b (built with one sort + one small
scatter, ~0.3 s). A probe is then 2 LUT gathers + two *contiguous*
32-row block reads + vector compares — ~5 scattered accesses per
candidate, with a masked widen-loop for the rare overfull bucket
(low-complexity repeat families).

Visited-set membership inside the loop is a ``searchsorted`` against a
periodically re-merged sorted id array — no scatters. Transient
duplicate walkers (a node re-entered between merges) collapse at the
next merge; equal-depth duplicates collapse in the per-iteration
unique pass, so a bubble costs at most one extra walker for one merge
window.

``rc_index``/``range_scan_part`` serve the primer scans
(find_oligos_in_kmers, primers.rs:163-226): a forward prefix match is
a contiguous key range of the sorted partition, and a reverse-strand
match is a contiguous range of the revcomp-sorted index (a k-mer ends
with rc(oligo) iff its revcomp starts with the oligo), so each scan is
a tiny range-enumeration call instead of a full-table sweep.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import KMER_SENTINEL
from .hashtable import _revcomp_kernel

EMPTY = np.uint64(KMER_SENTINEL)
_INF32 = np.int32(0x7FFF_FFFF)

# Reach-loop shape defaults (all grow-and-retry on overflow).
F_CAP = 64          # live walkers per iteration (typical walks carry < 30)
V_CAP = 1 << 15     # visited rows per call
DEPTH = 512         # waves of host walk covered per prefetch
MERGE_EVERY = 32    # visited re-merge cadence (iterations)

BLOCK = 32          # contiguous rows fetched per bucket probe


# -- bucket LUT sidecar --------------------------------------------------------


def _lut_bits(n_slots: int, k: int) -> int:
    """Bucket count ~ rows/16 keeps probes at 1-2 block reads; bounded
    by the key width so tiny-k tests stay valid."""
    b = max(6, n_slots.bit_length() - 5)
    return min(b, 2 * k - 1, 26)


@functools.partial(jax.jit, static_argnames=("bits", "shift"))
def _build_lut_kernel(keys, bits: int, shift: int):
    """lut[b] = first row index whose bucket (key >> shift) >= b, for
    b in [0, 2^bits]; == n_rows for buckets past the last occupied row.
    One full-width sort compacts the run starts (first row of each
    bucket), then a small scatter + reverse-cummin backfill."""
    n = keys.shape[0]
    bi = jnp.minimum(keys >> jnp.uint64(shift), jnp.uint64(1) << jnp.uint64(bits))
    prev = jnp.concatenate([jnp.full((1,), jnp.uint64(0xFFFF_FFFF_FFFF_FFFF)), bi[:-1]])
    first = bi != prev
    pos = jnp.arange(n, dtype=jnp.int64)
    packed = jnp.where(first, (bi.astype(jnp.int64) << 32) | pos,
                       jnp.int64(0x7FFF_FFFF_FFFF_FFFF))
    n_buckets = (1 << bits) + 1
    take = min(n_buckets, n)
    sp = jax.lax.sort(packed, is_stable=False)[:take]
    live = sp != jnp.int64(0x7FFF_FFFF_FFFF_FFFF)
    idx = jnp.where(live, sp >> 32, n_buckets)  # dropped when past end
    val = jnp.where(live, sp & jnp.int64(0xFFFF_FFFF), 0).astype(jnp.int32)
    lut = jnp.full((n_buckets,), _INF32)
    lut = lut.at[idx].min(val, mode="drop")
    # backfill: empty buckets inherit the next occupied bucket's start
    lut = jnp.flip(jax.lax.cummin(jnp.flip(jnp.minimum(lut, jnp.int32(n)))))
    return lut


@dataclass(frozen=True)
class PartSidecar:
    """Per-partition device index structures (immutable per flush)."""

    keys2d: jax.Array   # [n_blocks, BLOCK] view of the sorted keys
    counts2d: jax.Array
    lut: jax.Array      # [2^bits + 1] int32 row offsets
    bits: int
    shift: int


def build_sidecar(part_keys, part_counts, k: int) -> PartSidecar:
    n_slots = int(part_keys.shape[0])
    bits = _lut_bits(n_slots, k)
    shift = 2 * k - bits
    lut = _build_lut_kernel(part_keys, bits, shift)
    pad = (-n_slots) % BLOCK
    if pad:  # partition widths are powers of two >= 64, so this is moot
        part_keys = jnp.concatenate(
            [part_keys, jnp.full((pad,), jnp.uint64(EMPTY))]
        )
        part_counts = jnp.concatenate(
            [part_counts, jnp.zeros((pad,), jnp.uint32)]
        )
    return PartSidecar(
        keys2d=part_keys.reshape(-1, BLOCK),
        counts2d=part_counts.reshape(-1, BLOCK),
        lut=lut, bits=bits, shift=shift,
    )


# -- rc index (primer scans) ---------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def _rc_index_kernel(keys, k: int):
    """(revcomp(key) sorted ascending, original row) for one partition.
    EMPTY rows keep the EMPTY sentinel (u64 max) and sort to the end."""
    rc = _revcomp_kernel(keys, k)
    idx = jnp.arange(keys.shape[0], dtype=jnp.uint32)
    return jax.lax.sort((rc, idx), num_keys=1, is_stable=False)


@functools.partial(jax.jit, static_argnames=("shift", "max_out"))
def _range_rows_kernel(sorted_keys, oligos, n_keys, shift: int, max_out: int):
    """Row positions of ``sorted_keys`` lying in any oligo's key range
    [oligo << shift, (oligo+1) << shift), padded with -1 to max_out.
    ``oligos`` may be padded with 4^olen, whose range is empty.
    Returns (rows int32 [max_out], total matches)."""
    lo = oligos << jnp.uint64(shift)
    hi = (oligos + jnp.uint64(1)) << jnp.uint64(shift)
    s = jnp.minimum(jnp.searchsorted(sorted_keys, lo), n_keys)
    e = jnp.minimum(jnp.searchsorted(sorted_keys, hi), n_keys)
    lens = (e - s).astype(jnp.int32)
    offs = jnp.cumsum(lens)
    total = offs[-1]
    j = jnp.arange(max_out, dtype=jnp.int32)
    seg = jnp.minimum(
        jnp.searchsorted(offs, j, side="right"), offs.shape[0] - 1
    )
    base = offs[seg] - lens[seg]
    row = s[seg].astype(jnp.int32) + (j - base)
    row = jnp.where(j < total, row, jnp.int32(-1))
    return row, total


@jax.jit
def _gather_rows_kernel(keys, counts, rows):
    safe = jnp.maximum(rows, 0)
    return keys[safe], counts[safe]


def range_scan_part(part_keys, part_counts, rc_sorted, rc_order, n: int,
                    oligos: np.ndarray, oligo_len: int, k: int,
                    max_out: int = 1 << 12):
    """One partition's primer matches via sorted range queries.

    Semantics match the full-sweep scan (_prefix_scan_sorted_kernel /
    primers.rs:163-226): forward prefix hits report the table k-mer;
    reverse-strand hits (k-mer ends with rc(oligo), i.e. revcomp starts
    with the oligo) report revcomp(k-mer); a dual-orientation row
    reports the forward form only. Count filtering is the caller's.

    Returns (kmers u64, counts u32) for all matched rows.
    """
    from .encoding import revcomp_kmers_np

    shift = 2 * (k - oligo_len)
    pad_val = np.uint64(1) << np.uint64(2 * oligo_len)  # above all oligos
    width = max(64, 1 << max(len(oligos) - 1, 0).bit_length())
    padded = np.full(width, pad_val, np.uint64)
    padded[: len(oligos)] = np.sort(np.asarray(oligos, np.uint64))
    oligos_j = jnp.asarray(padded)

    def rows_of(sorted_keys, cur_max):
        while True:
            rows, total = _range_rows_kernel(
                sorted_keys, oligos_j, jnp.int64(n), shift, cur_max
            )
            total = int(total)
            if total <= cur_max:
                return np.asarray(rows)[:total], cur_max
            cur_max = 1 << (total - 1).bit_length()

    fwd_rows, max_out = rows_of(part_keys, max_out)
    rc_pos, _ = rows_of(rc_sorted, max_out)
    rc_rows = np.asarray(
        _gather_rows_kernel(rc_order, rc_order,
                            jnp.asarray(rc_pos.astype(np.int64)))[0]
    ).astype(np.int64) if len(rc_pos) else np.zeros(0, np.int64)
    fwd_rows = fwd_rows.astype(np.int64)
    # forward precedence: a dual-orientation row reports forward only
    rc_rows = np.setdiff1d(rc_rows, fwd_rows, assume_unique=False)

    all_rows = np.concatenate([fwd_rows, rc_rows])
    if len(all_rows) == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    kh, ch = _gather_rows_kernel(part_keys, part_counts,
                                 jnp.asarray(all_rows))
    kh, ch = np.asarray(kh), np.asarray(ch)
    out = kh.copy()
    if len(rc_rows):
        out[len(fwd_rows):] = revcomp_kmers_np(kh[len(fwd_rows):], k)
    return out, ch


# -- reachability closure ------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("k", "depth", "f_cap", "v_cap", "bases"),
)
def _reach_kernel(keys2d, counts2d, luts, shifts, c0, min_count,
                  k: int, depth: int, f_cap: int, v_cap: int,
                  bases: tuple):
    """Depth-capped 8-neighbour closure over the partitioned table.

    keys2d/counts2d/luts: tuples of per-partition sidecar arrays;
    shifts: per-partition LUT shifts (static values inside tuples);
    bases: per-partition global row-id offsets. c0: the host wave's
    candidate k-mers, EMPTY-padded. Returns (visited_keys,
    visited_counts [v_cap], n_visited, iters, overflow, done).
    """
    kmask = jnp.uint64((1 << (2 * k)) - 1)
    c_cap = c0.shape[0]
    inf = jnp.int32(_INF32)

    def lookup(cand):
        """(global row id | INF, count) per candidate k-mer."""
        ids = jnp.full(cand.shape, inf)
        cnt = jnp.zeros(cand.shape, jnp.uint32)
        for k2d, c2d, lut, shift, base in zip(
            keys2d, counts2d, luts, shifts, bases
        ):
            b = jnp.minimum(
                cand >> jnp.uint64(shift),
                jnp.uint64(lut.shape[0] - 2),
            ).astype(jnp.int64)
            s = lut[b]
            e = lut[b + 1]
            j0 = (s >> 5).astype(jnp.int64)  # BLOCK = 32

            def probe(j0, s, e, found_row, found_cnt, live):
                jb = jnp.minimum(j0, k2d.shape[0] - 1)
                jb2 = jnp.minimum(j0 + 1, k2d.shape[0] - 1)
                blk = jnp.concatenate([k2d[jb], k2d[jb2]], axis=-1)
                cblk = jnp.concatenate([c2d[jb], c2d[jb2]], axis=-1)
                rows = (jb * BLOCK)[:, None] + jnp.arange(
                    2 * BLOCK, dtype=jnp.int64
                )[None, :]
                valid = (rows >= s[:, None]) & (rows < e[:, None])
                hit = valid & (blk == cand[:, None]) & live[:, None]
                anyhit = jnp.any(hit, axis=-1)
                row = jnp.max(jnp.where(hit, rows, -1), axis=-1)
                cc = jnp.max(jnp.where(hit, cblk, 0), axis=-1)
                found_row = jnp.where(anyhit, row, found_row)
                found_cnt = jnp.where(anyhit, cc, found_cnt)
                # still unresolved: bucket extends past the scanned window
                live = live & ~anyhit & (e > (jb2 + 1) * BLOCK)
                return found_row, found_cnt, live

            live = (cand != jnp.uint64(EMPTY)) & (e > s)
            found_row = jnp.full(cand.shape, jnp.int64(-1))
            found_cnt = jnp.zeros(cand.shape, jnp.uint32)
            found_row, found_cnt, live = probe(
                j0, s, e, found_row, found_cnt, live
            )

            def widen_cond(st):
                return jnp.any(st[3])

            def widen_body(st):
                j, fr, fc, lv = st
                j = j + 2
                fr, fc, lv = probe(j, s, e, fr, fc, lv)
                return j, fr, fc, lv

            _, found_row, found_cnt, _ = jax.lax.while_loop(
                widen_cond, widen_body, (j0, found_row, found_cnt, live)
            )
            mine = found_row >= 0
            ids = jnp.where(
                mine, found_row.astype(jnp.int32) + jnp.int32(base), ids
            )
            cnt = jnp.where(mine, found_cnt, cnt)
        ok = cnt >= min_count
        return jnp.where(ok, ids, inf)

    def expand(frontier):
        f = frontier[:, None]
        b = jnp.arange(4, dtype=jnp.uint64)[None, :]
        fwd = ((f << jnp.uint64(2)) | b) & kmask
        rev = (b << jnp.uint64(2 * (k - 1))) | (f >> jnp.uint64(2))
        cand = jnp.concatenate([fwd, rev], axis=1).reshape(-1)
        live = jnp.repeat(frontier != jnp.uint64(EMPTY), 8)
        return jnp.where(live, cand, jnp.uint64(EMPTY))

    def canon(c):
        rc = _revcomp_kernel(c, k)
        return jnp.where(c == jnp.uint64(EMPTY), jnp.uint64(EMPTY),
                         jnp.minimum(c, rc))

    def process(cand, visited, prev_ids):
        """New hits among ``cand``: not visited, not in the previous
        frontier, unique. Returns (frontier kmers [f_cap], their ids
        [f_cap] sorted, n_new, overflow)."""
        cc = canon(cand)
        ids = lookup(cc)
        vi = jnp.minimum(jnp.searchsorted(visited, ids), visited.shape[0] - 1)
        seen_v = visited[vi] == ids
        pi = jnp.minimum(
            jnp.searchsorted(prev_ids, ids), prev_ids.shape[0] - 1
        )
        seen_p = prev_ids[pi] == ids
        ids = jnp.where(seen_v | seen_p, inf, ids)
        order = jnp.argsort(ids)
        ids_s = ids[order]
        km_s = cc[order]
        first = jnp.concatenate(
            [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]]
        )
        ids_s = jnp.where(first, ids_s, inf)
        km_s = jnp.where(first & (ids_s != inf), km_s, jnp.uint64(EMPTY))
        n_all = jnp.sum(ids_s != inf).astype(jnp.int32)
        order2 = jnp.argsort(ids_s)
        ids_f = ids_s[order2][:f_cap]
        km_f = km_s[order2][:f_cap]
        n_new = jnp.sum(ids_f != inf).astype(jnp.int32)
        return km_f, ids_f, n_new, n_all > n_new

    def merge_visited(visited, pend):
        merged = jnp.sort(jnp.concatenate([visited, pend.reshape(-1)]))
        first = jnp.concatenate(
            [jnp.ones((1,), bool), merged[1:] != merged[:-1]]
        )
        m2 = jnp.sort(jnp.where(first, merged, inf))[:v_cap]
        n = jnp.sum(m2 != inf).astype(jnp.int32)
        return m2, n

    visited0 = jnp.full((v_cap,), inf)
    pend0 = jnp.full((MERGE_EVERY, f_cap), inf)
    prev0 = jnp.full((c_cap,), inf)

    km0, ids0, n0, ov0 = process(c0, visited0, prev0)
    pend0 = pend0.at[0].set(ids0)
    # prev-frontier dedup array is 8*f_cap wide throughout the loop
    prev_sorted0 = jnp.sort(
        jnp.concatenate([ids0, jnp.full((8 * f_cap - f_cap,), inf)])
    )

    def body(state):
        (frontier, prev_ids, visited, n_vis, n_pend, pend, it,
         overflow, _) = state
        cand = expand(frontier)
        km, ids, n_new, ov = process(cand, visited, prev_ids)
        slot = it % MERGE_EVERY
        pend = pend.at[slot].set(ids)
        n_pend = n_pend + n_new

        def do_merge(args):
            v, _nv, _np, p = args
            v2, nv2 = merge_visited(v, p)
            return v2, nv2, jnp.int32(0), jnp.full_like(p, inf)

        visited, n_vis, n_pend, pend = jax.lax.cond(
            slot == MERGE_EVERY - 1, do_merge, lambda a: a,
            (visited, n_vis, n_pend, pend),
        )
        prev_sorted = jnp.sort(
            jnp.concatenate([ids, jnp.full((8 * f_cap - f_cap,), inf)])
        )
        done = n_new == 0
        return (km, prev_sorted, visited, n_vis, n_pend, pend, it + 1,
                overflow | ov, done)

    def cond(state):
        _, _, _, n_vis, n_pend, _, it, overflow, done = state
        # iteration 0 (the roots) ran before the loop; body entries at
        # it = 1..depth perform exactly `depth` expansion levels
        return (
            (~done) & (it <= depth) & (~overflow)
            & (n_vis + n_pend + f_cap < v_cap)
        )

    # after iteration 0 the frontier is at most f_cap wide, so the loop
    # candidate width is 8 * f_cap (c_cap only shapes iteration 0)
    state = (km0, prev_sorted0, visited0, jnp.int32(0), n0, pend0,
             jnp.int32(1), ov0, n0 == 0)
    (_, _, visited, n_vis, n_pend, pend, it, overflow, done
     ) = jax.lax.while_loop(cond, body, state)
    visited, n_vis = merge_visited(visited, pend)
    v_full = n_vis + n_pend + f_cap >= v_cap

    # gather keys/counts of the visited rows
    out_keys = jnp.full((v_cap,), jnp.uint64(EMPTY))
    out_counts = jnp.zeros((v_cap,), jnp.uint32)
    live = visited != inf
    for k2d, c2d, base in zip(keys2d, counts2d, bases):
        n_rows = k2d.shape[0] * BLOCK
        local = (visited - jnp.int32(base)).astype(jnp.int64)
        mine = live & (local >= 0) & (local < n_rows)
        safe = jnp.where(mine, local, 0)
        flat_k = k2d.reshape(-1)
        flat_c = c2d.reshape(-1)
        out_keys = jnp.where(mine, flat_k[safe], out_keys)
        out_counts = jnp.where(mine, flat_c[safe], out_counts)
    return out_keys, out_counts, n_vis, it, overflow | v_full, done


@dataclass
class ReachResult:
    keys: np.ndarray      # visited row keys, ascending
    counts: np.ndarray
    complete: bool        # frontier emptied: closure fully explored
    iters: int


def reach(sidecars: list[PartSidecar], bases: tuple, roots: np.ndarray,
          min_count: int, k: int, depth: int = DEPTH, f_cap: int = F_CAP,
          v_cap: int = V_CAP, max_retries: int = 4) -> ReachResult | None:
    """Host driver for the closure kernel with grow-and-retry.

    ``roots``: candidate k-mers of the current host wave (directional;
    canonicalized on device). Returns None when the closure overflowed
    even at the largest retry shapes (the caller falls back to exact
    but slow per-wave device lookups).
    """
    roots = np.unique(np.asarray(roots, dtype=np.uint64).reshape(-1))
    roots = roots[roots != EMPTY]
    if len(roots) == 0:
        return ReachResult(
            np.zeros(0, np.uint64), np.zeros(0, np.uint32), True, 0
        )
    keys2d = tuple(s.keys2d for s in sidecars)
    counts2d = tuple(s.counts2d for s in sidecars)
    luts = tuple(s.lut for s in sidecars)
    shifts = tuple(
        jnp.asarray(s.shift, jnp.uint64) for s in sidecars
    )

    out_k: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    complete = True
    iters = 0
    # start wide enough that the root wave's own hits fit the frontier
    # (iteration 0 can yield up to len(roots) new rows)
    while f_cap < min(len(roots), 1024):
        f_cap, v_cap = f_cap * 2, v_cap * 2
    c_cap = 8 * f_cap
    for start in range(0, len(roots), c_cap):
        chunk = roots[start : start + c_cap]
        c0 = np.full(c_cap, EMPTY, np.uint64)
        c0[: len(chunk)] = chunk
        cur_f, cur_v = f_cap, v_cap
        for attempt in range(max_retries + 1):
            keys, counts, n_vis, it, overflow, done = _reach_kernel(
                keys2d, counts2d, luts, shifts, jnp.asarray(c0),
                jnp.uint32(max(min_count, 1)), k, depth, cur_f, cur_v,
                bases,
            )
            if not bool(overflow):
                break
            if attempt == max_retries:
                return None
            cur_f, cur_v = cur_f * 2, cur_v * 4
        n = int(n_vis)
        out_k.append(np.asarray(keys)[:n])
        out_c.append(np.asarray(counts)[:n])
        complete = complete and bool(done)
        iters += int(it)

    keys = np.concatenate(out_k)
    counts = np.concatenate(out_c)
    order = np.argsort(keys)
    keys, counts = keys[order], counts[order]
    if len(out_k) > 1 and len(keys):
        keep = np.concatenate([[True], keys[1:] != keys[:-1]])
        keys, counts = keys[keep], counts[keep]
    return ReachResult(keys, counts, complete, iters)
