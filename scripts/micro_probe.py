"""On-chip: per-call cost of the table probe, Pallas DMA vs XLA gather,
with SCATTERED live candidates (a fori_loop varies the candidate set
per iteration so HBM row-buffer effects cannot fake the numbers)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from sharkmer_tpu.ops import reach as R
from sharkmer_tpu.ops import pallas_kernels as PK

K = 21
N_ROWS = 1 << 26
C = 128
ITERS = 512

rng = np.random.default_rng(0)
keys = np.sort(
    rng.integers(0, 1 << (2 * K), size=N_ROWS, dtype=np.uint64))
counts = rng.integers(1, 100, size=N_ROWS, dtype=np.uint32)

sc = R.build_sidecar(jnp.asarray(keys), jnp.asarray(counts), K)
print("sidecar: super2d" if sc.super2d is not None else "sidecar: packed2d",
      "probe_blocks", sc.probe_blocks, file=sys.stderr)
import os
os.environ["SHARKMER_PALLAS_PROBE"] = "0"
sc_x = R.build_sidecar(jnp.asarray(keys), jnp.asarray(counts), K)
print("xla sidecar packed2d:", sc_x.packed2d is not None, file=sys.stderr)

shift = jnp.uint64(sc.shift)
kmask = jnp.uint64((1 << (2 * K)) - 1)
inf = jnp.int32(R._INF32)
mc = jnp.uint32(1)

# random table keys to use as live candidates (hits), one batch per iter
cand_pool = jnp.asarray(
    keys[rng.integers(0, N_ROWS, size=ITERS * C)].reshape(ITERS, C))


def lut_se(cand, lut):
    b = jnp.minimum(cand >> shift, jnp.uint64(lut.shape[0] - 2)).astype(
        jnp.int64)
    return lut[b], lut[b + 1]


import functools


@functools.partial(jax.jit, static_argnames=("mode",))
def loop(pool, plane_or_packed, lut, mode: str):
    def body(i, acc):
        cand = pool[i]
        s, e = lut_se(cand, lut)
        live = (cand != jnp.uint64(R.EMPTY)) & (e > s)
        if mode == "pallas":
            clo = cand.astype(jnp.uint32)
            chi = ((cand >> jnp.uint64(32)).astype(jnp.uint32)
                   & jnp.uint32((1 << (2 * K - 32)) - 1))
            n_super = plane_or_packed.shape[0]
            r16 = jnp.clip((s >> 6) & ~jnp.int32(7), 0, n_super - 16)
            row = PK.probe_rows(
                plane_or_packed, r16, clo, chi,
                jnp.where(live, s, 0), jnp.where(live, e, 0), mc, K)
            ids = jnp.where(row >= 0, row, inf)
        else:
            k2d = plane_or_packed
            j0 = (s >> R._LOG2B).astype(jnp.int64)
            jbs = [jnp.minimum(j0 + w, k2d.shape[0] - 1) for w in range(2)]
            blk = jnp.concatenate([k2d[j] for j in jbs], axis=-1)
            rows = (jnp.minimum(j0, k2d.shape[0] - 1) * R.BLOCK)[:, None] + \
                jnp.arange(2 * R.BLOCK, dtype=jnp.int64)[None, :]
            valid = (rows >= s[:, None]) & (rows < e[:, None])
            key_eq = (blk & kmask) == cand[:, None]
            above = (blk >> jnp.uint64(2 * K)) >= mc
            hit = valid & key_eq & above & live[:, None]
            row = jnp.max(jnp.where(hit, rows, -1), axis=-1)
            ids = jnp.where(row >= 0, row.astype(jnp.int32), inf)
        return acc + jnp.sum(ids != inf, dtype=jnp.int32)
    return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))


for mode, arr in (("pallas", sc.super2d), ("xla", sc_x.packed2d)):
    hits = loop(cand_pool, arr, sc.lut, mode)
    jax.block_until_ready(hits)
    t0 = time.perf_counter()
    hits = loop(cand_pool, arr, sc.lut, mode)
    jax.block_until_ready(hits)
    dt = time.perf_counter() - t0
    print(f"{mode:7s}: {dt:7.3f}s, {dt/ITERS*1e3:6.3f} ms/call, "
          f"hits={int(hits)}/{ITERS*C}")
