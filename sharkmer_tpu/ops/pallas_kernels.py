"""Pallas TPU kernels for the sorted-store hot path.

The drain pipeline is sort -> run-length-encode -> compact. The RLE
step needs, for every element of the sorted key array, the position of
the start of its equal-key run (``run_start``): run totals are then
``pos - run_start + 1`` at run-last positions. In XLA this is a
``cummax`` over run-start positions — a multi-pass log-depth scan over
HBM. Here it is ONE Pallas pass plus a trivial stitch:

* the flat key array is viewed as ``[rows, 512]``; each grid step
  loads an ``[R, 512]`` tile of the hi/lo u32 planes of the keys
  (Mosaic has no u64 registers — the planes are split outside, and
  equality of u64 keys is equality of both planes);
* run-start flags compare each element against its flat predecessor
  (a lane shift that wraps the previous row's tail; the tile boundary
  reads the previous tile's last row through a second BlockSpec on
  the same array — the deployment toolchain cannot compile SMEM
  writes under a grid, so there is no sequential carry);
* the tile-local flat running max of ``first ? pos : -1`` is built
  from log2(512) shifted-max steps (window = one full row) plus a
  log2(R) cross-row prefix fix;
* the host-side wrapper stitches tiles with an XLA ``cummax`` over
  the per-tile maxima (one tiny [n_tiles] scan) and a fused
  elementwise max — every element's run start is in its own tile or
  summarized by a whole earlier tile, so the stitch is exact.

Used only on TPU for large drains; the XLA ``cummax`` formulation
remains the fallback (and the differential oracle in tests).

``stitch_rows`` is the drain's other Pallas kernel: after the
compaction step is restructured as a BATCHED row sort (jax.lax.sort
over [R, W] rows is ~2x the flat-sort throughput at W = 2^16 on the
target chip — fewer bitonic levels), each row holds its survivors
front-compacted with a sentinel tail, and the global compact run is
produced by concatenating the R occupied prefixes. That concatenation
is R HBM->HBM DMAs at prefix-sum offsets, issued by a sequential grid
in ascending-offset order: each row writes its FULL static-width row
at its offset, and the next row's write overwrites the previous row's
sentinel tail — variable-length copies without dynamic DMA shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas TPU lowering may be absent on host-only builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANES = 512  # flat elements per row


if HAVE_PALLAS:

    def _shift_right_flat(v, s: int, fill):
        """Shift a [R, LANES] tile right by s positions (s < LANES) in
        FLAT row-major order, filling vacated leading slots with `fill`.

        Uses pltpu.roll for the cross-row wrap: Mosaic cannot
        concatenate narrow (width-1) vectors along the row axis."""
        R = v.shape[0]
        prev_row = pltpu.roll(v, shift=jnp.int32(1), axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        prev_row = jnp.where(row == 0, fill, prev_row)
        return jnp.concatenate(
            [prev_row[:, LANES - s :], v[:, : LANES - s]], axis=1
        )

    def _run_start_kernel(hi_ref, lo_ref, hi_b_ref, lo_b_ref, out_ref):
        R = hi_ref.shape[0]
        step = pl.program_id(0)

        hi = hi_ref[:]
        lo = lo_ref[:]

        # flat predecessor of every element; slot (0, 0) comes from the
        # previous tile's last element (boundary refs)
        prev_hi = _shift_right_flat(hi, 1, jnp.uint32(0))
        prev_lo = _shift_right_flat(lo, 1, jnp.uint32(0))
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        at00 = (row == 0) & (col == 0)
        prev_hi = jnp.where(at00, hi_b_ref[7, LANES - 1], prev_hi)
        prev_lo = jnp.where(at00, lo_b_ref[7, LANES - 1], prev_lo)

        base = step * (R * LANES)
        pos = base + row * LANES + col
        # element 0 of the whole array is always a run start (its
        # boundary ref is a clamped self-read)
        first = (hi != prev_hi) | (lo != prev_lo) | (pos == 0)
        v = jnp.where(first, pos, jnp.int32(-1))

        # running max in flat order: lane-shift steps cover a window of
        # exactly one row (512) ...
        s = 1
        while s < LANES:
            v = jnp.maximum(v, _shift_right_flat(v, s, jnp.int32(-1)))
            s *= 2
        # ... so each row's max is the max over that row alone; an
        # inclusive cummax over row maxima, shifted down one row,
        # extends every element's window to the whole tile prefix
        row_max = jnp.broadcast_to(
            jnp.max(v, axis=1, keepdims=True), (R, LANES)
        )
        s = 1
        while s < R:
            shifted = jnp.where(
                row < s,
                jnp.int32(-1),
                pltpu.roll(row_max, shift=jnp.int32(s), axis=0),
            )
            row_max = jnp.maximum(row_max, shifted)
            s *= 2
        row_carry = jnp.where(
            row == 0,
            jnp.int32(-1),
            pltpu.roll(row_max, shift=jnp.int32(1), axis=0),
        )
        out_ref[:] = jnp.maximum(v, row_carry)

    @functools.partial(
        jax.jit, static_argnames=("rows_per_tile", "interpret")
    )
    def run_starts(sorted_keys, rows_per_tile: int = 256,
                   interpret: bool = False):
        """Position of each element's equal-key run start, for a SORTED
        u64 key array whose length is a multiple of rows_per_tile*512.

        Every run start within a tile is exact from the kernel; a run
        that began in an earlier tile has its start position equal to
        the running max of earlier tiles' maxima, stitched here with
        one tiny XLA scan over [n_tiles].

        ``interpret=True`` runs the kernel in the Pallas interpreter
        (for differential tests on host CPUs without a TPU).
        """
        n = sorted_keys.shape[0]
        R = rows_per_tile
        tile = R * LANES
        if n % tile:
            raise ValueError(f"length {n} not a multiple of tile {tile}")
        n_tiles = n // tile
        hi = (sorted_keys >> jnp.uint64(32)).astype(jnp.uint32)
        lo = sorted_keys.astype(jnp.uint32)
        hi = hi.reshape(n // LANES, LANES)
        lo = lo.reshape(n // LANES, LANES)

        # index maps return explicit int32 (concrete numpy scalars —
        # they may not capture tracers, and under jax_enable_x64 a bare
        # python 0 lowers to i64, which Mosaic fails to legalize)
        zero = np.int32(0)
        spec = pl.BlockSpec(
            (R, LANES), lambda i: (i, zero), memory_space=pltpu.VMEM
        )
        # 8-row block ending at the previous tile's last row (Mosaic
        # requires sublane-divisible blocks; row 7 of this block is the
        # boundary row). Clamped self-read at i == 0 — the kernel
        # overrides element 0 via the pos == 0 rule.
        if R % 8:
            raise ValueError("rows_per_tile must be a multiple of 8")
        bspec = pl.BlockSpec(
            (8, LANES),
            lambda i: (
                jnp.maximum(i * np.int32(R // 8) - np.int32(1), zero),
                zero,
            ),
            memory_space=pltpu.VMEM,
        )
        local = pl.pallas_call(
            _run_start_kernel,
            grid=(n_tiles,),
            in_specs=[spec, spec, bspec, bspec],
            out_specs=pl.BlockSpec(
                (R, LANES), lambda i: (i, zero), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
            interpret=interpret,
        )(hi, lo, hi, lo)

        local = local.reshape(n_tiles, tile)
        tile_max = jnp.max(local, axis=1)
        carry = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), jax.lax.cummax(tile_max)[:-1]]
        )
        return jnp.maximum(local, carry[:, None]).reshape(-1)

    _I32_MAX = np.int32(0x7FFF_FFFF)

    def _shift_left_flat(v, s: int, fill):
        """Shift a [R, LANES] tile left by s positions (s < LANES) in
        FLAT row-major order, filling vacated trailing slots with
        ``fill`` — the successor-window mirror of _shift_right_flat."""
        R = v.shape[0]
        next_row = pltpu.roll(v, shift=jnp.int32(R - 1), axis=0)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        next_row = jnp.where(row == R - 1, fill, next_row)
        return jnp.concatenate(
            [v[:, s:], next_row[:, :s]], axis=1
        )

    def _run_end_kernel(hi_ref, lo_ref, hi_b_ref, lo_b_ref, out_ref):
        """Mirror of _run_start_kernel: position of each element's
        equal-key run END (min-propagation over successors)."""
        R = hi_ref.shape[0]
        step = pl.program_id(0)
        n = pl.num_programs(0) * (R * LANES)

        hi = hi_ref[:]
        lo = lo_ref[:]

        # flat successor of every element; the tile's last slot comes
        # from the next tile's first element (boundary refs)
        nxt_hi = _shift_left_flat(hi, 1, jnp.uint32(0))
        nxt_lo = _shift_left_flat(lo, 1, jnp.uint32(0))
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        at_end = (row == R - 1) & (col == LANES - 1)
        nxt_hi = jnp.where(at_end, hi_b_ref[0, 0], nxt_hi)
        nxt_lo = jnp.where(at_end, lo_b_ref[0, 0], nxt_lo)

        base = step * (R * LANES)
        pos = base + row * LANES + col
        # the whole array's last element is always a run end (its
        # boundary ref is a clamped self-read)
        last = (hi != nxt_hi) | (lo != nxt_lo) | (pos == n - 1)
        v = jnp.where(last, pos, _I32_MAX)

        # running min in flat order over successors: lane-shift steps
        # cover one full row, then a backward cross-row suffix fix
        s = 1
        while s < LANES:
            v = jnp.minimum(v, _shift_left_flat(v, s, _I32_MAX))
            s *= 2
        row_min = jnp.broadcast_to(
            jnp.min(v, axis=1, keepdims=True), (R, LANES)
        )
        s = 1
        while s < R:
            shifted = jnp.where(
                row >= R - s,
                _I32_MAX,
                pltpu.roll(row_min, shift=jnp.int32(R - s), axis=0),
            )
            row_min = jnp.minimum(row_min, shifted)
            s *= 2
        row_carry = jnp.where(
            row == R - 1,
            _I32_MAX,
            pltpu.roll(row_min, shift=jnp.int32(R - 1), axis=0),
        )
        out_ref[:] = jnp.minimum(v, row_carry)

    @functools.partial(
        jax.jit, static_argnames=("rows_per_tile", "interpret")
    )
    def run_ends(sorted_keys, rows_per_tile: int = 256,
                 interpret: bool = False):
        """Position of each element's equal-key run END, for a SORTED
        u64 key array whose length is a multiple of rows_per_tile*512.

        The backward mirror of :func:`run_starts` — one Pallas pass
        plus a tiny reverse-cummin stitch over per-tile minima. Used
        by the ghosted fresh drain, whose run totals live at run FIRST
        rows (total = run_end - pos + 1 there): with this kernel the
        drain needs no forward scan at all (first-markers are a local
        predecessor compare) and no jnp.flip round-trips.
        """
        n = sorted_keys.shape[0]
        R = rows_per_tile
        tile = R * LANES
        if n % tile:
            raise ValueError(f"length {n} not a multiple of tile {tile}")
        if R % 8:
            raise ValueError("rows_per_tile must be a multiple of 8")
        n_tiles = n // tile
        hi = (sorted_keys >> jnp.uint64(32)).astype(jnp.uint32)
        lo = sorted_keys.astype(jnp.uint32)
        hi = hi.reshape(n // LANES, LANES)
        lo = lo.reshape(n // LANES, LANES)

        zero = np.int32(0)
        spec = pl.BlockSpec(
            (R, LANES), lambda i: (i, zero), memory_space=pltpu.VMEM
        )
        # 8-row block starting at the NEXT tile's first row; clamped
        # self-read at the final tile — the kernel overrides the last
        # element via the pos == n-1 rule
        n_blocks = np.int32(n // LANES // 8)
        bspec = pl.BlockSpec(
            (8, LANES),
            lambda i: (
                jnp.minimum(
                    (i + np.int32(1)) * np.int32(R // 8),
                    n_blocks - np.int32(1),
                ),
                zero,
            ),
            memory_space=pltpu.VMEM,
        )
        local = pl.pallas_call(
            _run_end_kernel,
            grid=(n_tiles,),
            in_specs=[spec, spec, bspec, bspec],
            out_specs=pl.BlockSpec(
                (R, LANES), lambda i: (i, zero), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
            interpret=interpret,
        )(hi, lo, hi, lo)

        local = local.reshape(n_tiles, tile)
        tile_min = jnp.min(local, axis=1)
        # reverse cummin of LATER tiles' minima (a run whose end lies
        # beyond its tile is summarized by a whole later tile)
        carry = jnp.concatenate([
            jnp.flip(jax.lax.cummin(jnp.flip(tile_min)))[1:],
            jnp.full((1,), int(_I32_MAX), jnp.int32),
        ])
        return jnp.minimum(local, carry[:, None]).reshape(-1)

    # 1D u32 arrays are HBM-tiled in 1024-element tiles; DMA slice
    # offsets must be provably tile-divisible
    STITCH_ALIGN = 1024

    # -- reach probe: per-candidate bucket-window DMA gather ------------------
    #
    # The closure loop's table probe is the sPCR hot op: per BFS level
    # it must fetch, for each of C candidate k-mers, a ~64-row window
    # of the sorted table at the candidate's bucket offset. XLA lowers
    # those scattered row gathers at ~14M elem/s on this chip
    # (~0.6 ms/level at C=128), which made deep closures cost ~1 s
    # each. Here each window is ONE async HBM->VMEM DMA; C DMAs are
    # issued back-to-back and overlap in the memory system, then the
    # key/count compare runs vectorized on the VPU over all windows.
    #
    # The probe plane is a [n_super, 128] u32 array: super-row s holds
    # table rows [64s, 64s+64) of the count-packed key plane as
    # [lo(rows 64s..+31) | hi(same) | lo(+32..+63) | hi(same)] — u64
    # keys travel as u32 halves (the deployment backend's X64-rewrite
    # pass cannot rewrite custom calls with u64 operands), and the
    # 128-lane layout matches the HBM tile so each window DMA moves
    # whole tiles. Windows start at 8-super-row-aligned offsets
    # (r16 = (j0 >> 1) & ~7, clamped), so a PROBE_WSUP-row window
    # always covers the probe's [s, e) bucket rows for probe widths
    # up to 16 blocks.

    PROBE_CHUNK = 128  # candidates per grid step (= DMAs in flight)
    PROBE_WSUP = 16    # super-rows (of 64 table rows) per window

    def _gather_windows_kernel(r16_ref, plane_ref, out_ref, sems):
        """DMA PROBE_CHUNK aligned [PROBE_WSUP, 128] windows of the
        probe plane straight into the output block — one async copy
        per candidate, all in flight together. The key/count compare
        runs in XLA on the gathered windows: keeping it out of the
        kernel keeps VMEM at ~2 output blocks (a per-row broadcast of
        the candidate scalars inside the kernel cost 8 [C*16, 1]
        VMEM blocks, which pad to a full 128-lane tile each and blew
        the 16 MB scoped-vmem limit at wide frontiers)."""
        g = pl.program_id(0)

        # python-unrolled: a lax.fori_loop here sends this deployment
        # toolchain's Mosaic lowering into unbounded
        # _convert_element_type recursion (an i64 index convert
        # materializes under jax_enable_x64 that the pre-2025-05
        # runtime cannot extsi-lower); all scalars are pinned to i32
        # for the same reason
        def dma(i: int):
            off = pl.multiple_of(
                r16_ref[g * np.int32(PROBE_CHUNK) + np.int32(i)], 8
            )
            return pltpu.make_async_copy(
                plane_ref.at[pl.ds(off, PROBE_WSUP), :],
                out_ref.at[
                    pl.ds(np.int32(i * PROBE_WSUP), PROBE_WSUP), :
                ],
                sems.at[np.int32(i)],
            )

        for i in range(PROBE_CHUNK):
            dma(i).start()
        for i in range(PROBE_CHUNK):
            dma(i).wait()

    @functools.partial(
        jax.jit, static_argnames=("k", "interpret")
    )
    def probe_rows(plane, r16, clo, chi, s, e, mc, k: int,
                   interpret: bool = False):
        """Row index (or -1) of each candidate's key in the sorted
        count-packed plane, restricted to bucket window [s_i, e_i) and
        count >= mc. ``r16`` [C] i32: 8-aligned super-row window
        starts; ``clo``/``chi`` [C] u32: candidate key halves (chi
        pre-masked to the key's hi bits); C must be a multiple of
        PROBE_CHUNK. Valid for 17 <= k <= 26: key bits 0..31 in the
        lo half, key bits 32..2k-1 in the hi half's low bits, count
        above them."""
        C = r16.shape[0]
        R = PROBE_CHUNK * PROBE_WSUP
        zero = np.int32(0)
        r16 = r16.astype(jnp.int32)
        win = pl.pallas_call(
            _gather_windows_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(C // PROBE_CHUNK,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (R, 128), lambda g, *_: (g, zero),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.SemaphoreType.DMA((PROBE_CHUNK,))],
            ),
            out_shape=jax.ShapeDtypeStruct(
                (C * PROBE_WSUP, 128), jnp.uint32
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(r16, plane)

        hk_mask = jnp.uint32((1 << (2 * k - 32)) - 1)
        ck_shift = jnp.uint32(2 * k - 32)
        w = win.reshape(C, PROBE_WSUP, 4, 32)
        lo = w[:, :, 0::2, :]   # [C, WSUP, 2, 32]
        hi = w[:, :, 1::2, :]
        rows = (
            64 * (r16[:, None, None, None]
                  + jnp.arange(PROBE_WSUP, dtype=jnp.int32)[
                      None, :, None, None])
            + 32 * jnp.arange(2, dtype=jnp.int32)[None, None, :, None]
            + jnp.arange(32, dtype=jnp.int32)[None, None, None, :]
        )
        mc32 = jnp.asarray(mc).astype(jnp.uint32)
        match = (
            (lo == clo.astype(jnp.uint32)[:, None, None, None])
            & ((hi & hk_mask) == chi.astype(jnp.uint32)[
                :, None, None, None])
            & ((hi >> ck_shift) >= mc32)
            & (rows >= s.astype(jnp.int32)[:, None, None, None])
            & (rows < e.astype(jnp.int32)[:, None, None, None])
        )
        return jnp.max(
            jnp.where(match, rows, jnp.int32(-1)), axis=(1, 2, 3)
        )

    def build_probe_plane(packed):
        """Count-packed u64 keys [n_rows] -> [n_rows/64, 128] u32
        probe plane (see probe_rows). n_rows must be a multiple of
        64."""
        n = packed.shape[0]
        lo = packed.astype(jnp.uint32).reshape(n // 64, 2, 1, 32)
        hi = (packed >> jnp.uint64(32)).astype(
            jnp.uint32
        ).reshape(n // 64, 2, 1, 32)
        return jnp.concatenate([lo, hi], axis=2).reshape(n // 64, 128)

    def _make_stitch_kernel(w: int):
        def _stitch_kernel(offs_ref, rows_ref, _init_ref, out_ref, sem):
            r = pl.program_id(0)
            off = pl.multiple_of(offs_ref[r], STITCH_ALIGN)
            cp = pltpu.make_async_copy(
                rows_ref.at[pl.ds(r * w, w)],
                out_ref.at[pl.ds(off, w)],
                sem,
            )
            cp.start()
            # wait before the grid advances: the NEXT row's window
            # overlaps this row's sentinel tail, and correctness relies
            # on ascending write order (later rows overwrite earlier
            # tails)
            cp.wait()
        return _stitch_kernel

    @functools.partial(
        jax.jit, donate_argnums=(2,), static_argnames=("w", "interpret")
    )
    def _stitch_call(rows_flat, offsets, out_init, w: int,
                     interpret: bool = False):
        return pl.pallas_call(
            _make_stitch_kernel(w),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(rows_flat.shape[0] // w,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                scratch_shapes=[pltpu.SemaphoreType.DMA],
            ),
            out_shape=jax.ShapeDtypeStruct(
                rows_flat.shape, rows_flat.dtype
            ),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(offsets, rows_flat, out_init)

    def stitch_rows(rows, offsets, fill, interpret: bool = False):
        """Concatenate each row's occupied prefix into one flat array.

        ``rows``: [R, W]; row r holds ``cnt_r`` live elements
        front-compacted, then ``fill`` padding; ``offsets`` [R] is the
        exclusive prefix sum of the counts. Counts (and hence offsets)
        MUST be multiples of STITCH_ALIGN u32 elements — 512 for u64
        rows (HBM tile divisibility of DMA slices). Returns [R*W]
        with the concatenated prefixes at the front and ``fill``
        behind — the drain's variable-length concat as R ordered
        full-row DMAs.

        u64 arrays are DMA'd as separate lo/hi u32 PLANES sharing the
        offsets (the deployment backend's X64-rewrite pass cannot
        rewrite custom calls with u64 operands, and a [R, W, 2] u32
        bitcast view tiles its unit axis to 128 — a 64x HBM blowup).
        For u64 rows the counts/offsets must therefore be multiples of
        STITCH_ALIGN (1024) in u64 elements. The fill's two u32 halves
        must agree (the sentinel's do).
        """
        R, W = rows.shape
        offsets = offsets.astype(jnp.int32)
        if rows.dtype == jnp.uint64:
            fill32 = jnp.asarray(fill, jnp.uint64).astype(jnp.uint32)
            planes = []
            for plane in (
                rows.astype(jnp.uint32),
                (rows >> jnp.uint64(32)).astype(jnp.uint32),
            ):
                init = jnp.full((R * W,), fill32, dtype=jnp.uint32)
                planes.append(
                    _stitch_call(plane.reshape(-1), offsets, init, w=W,
                                 interpret=interpret)
                )
            return (
                planes[1].astype(jnp.uint64) << jnp.uint64(32)
            ) | planes[0].astype(jnp.uint64)
        out_init = jnp.full((R * W,), fill, dtype=rows.dtype)
        return _stitch_call(rows.reshape(-1), offsets, out_init, w=W,
                            interpret=interpret)
