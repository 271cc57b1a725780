"""Measured effective HBM bandwidth on the attached TPU, for the
floor-accounting table in DESIGN.md ("The 1008x756 parity point").

Two numbers, both amortized over a lax.scan inside ONE dispatch (the
tunnel's block_until_ready returns early — utils/profiling.py):

- stream_add_gbps: y = x + 1 over a large f32 buffer (reads + writes
  2 x size) — the streaming ceiling relevant to relayout copies and
  elementwise fusions.
- row_take_gbps: the serving gather's exact shape — [P, 3] s32 row takes
  from a 9.1 MB per-view table at P = 762,048 (1008x756), counting
  output + input bytes once — grounds the "gathers at N% of streaming
  bandwidth" claim.

Appends one JSON line to results/probes_r5_hbm.txt.
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax
    import jax.numpy as jnp

    from pronerf_tpu.utils.profiling import amortized_timer, null_dispatch_ms

    dev = jax.devices()[0]
    null = null_dispatch_ms(5)

    # -- streaming add over 256 MB
    n = 64 * 1024 * 1024  # f32 -> 256 MB
    x = jnp.zeros((n,), jnp.float32)

    def step_add(c):
        y = x + c
        return c + y[0] * 1e-9

    ms_add = float(np.median([
        amortized_timer(step_add, jnp.float32(1.0), iters=8, null_ms=null)
        for _ in range(3)
    ]))
    add_gbps = 2 * n * 4 / (ms_add * 1e-3) / 1e9

    # -- serving-shaped row take: [P, 3] s32 rows from a [rows, 3] table
    P = 762048
    rows = 199584  # the u8-packed per-(view,sample) table rows at 1008x756
    table = jnp.zeros((rows, 3), jnp.int32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, rows, size=(P,), dtype=np.int32)
    )

    def step_take(c):
        g = jnp.take(table, (idx + c.astype(jnp.int32)) % rows, axis=0)
        return c + g[0, 0].astype(jnp.float32) * 1e-9

    ms_take = float(np.median([
        amortized_timer(step_take, jnp.float32(0.0), iters=8, null_ms=null)
        for _ in range(3)
    ]))
    take_bytes = P * 3 * 4 + rows * 3 * 4  # output + table read once
    take_gbps = take_bytes / (ms_take * 1e-3) / 1e9

    row = {
        "device_kind": dev.device_kind,
        "stream_add_ms_256MB": round(ms_add, 3),
        "stream_add_gbps": round(add_gbps, 1),
        "row_take_ms": round(ms_take, 3),
        "row_take_gbps": round(take_gbps, 1),
        "row_take_shape": f"take([{rows},3] s32, P={P})",
        "null_ms": round(null, 2),
    }
    print(json.dumps(row))
    out = REPO / "results/probes_r5_hbm.txt"
    with open(out, "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
