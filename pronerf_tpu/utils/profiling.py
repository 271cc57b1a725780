"""Tracing / profiling utilities — the TPU-native replacement for the
reference's CUDA-event timing + ptflops counters (SURVEY.md §5).

- ``device_timer``: wall timing with a forced device readback (NOTE: on the
  tunneled axon backend ``block_until_ready`` returns early, so timing must
  read a value back to host; this helper does).
- ``amortized_timer``: runs a carry->carry function K times inside one
  compiled ``lax.scan`` and divides — removes per-dispatch overhead.
- ``trace``: context manager around ``jax.profiler`` trace collection.
- ``pipeline_macs``: analytic MACs/frame for the three MLPs (the ptflops
  analogue; exact for dense layers).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


def readback(x):
    """Force a device->host read of one leaf (true synchronization)."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[0:1])


def null_dispatch_ms(reps: int = 5) -> float:
    """Median ms of a null jitted dispatch + readback — the per-call floor
    (tunnel round-trip on the axon backend, ~30 ms). Subtract from
    amortized measurements; compare against per-dispatch ones."""
    import jax
    import jax.numpy as jnp

    f0 = jax.jit(lambda x: x + 1.0)
    readback(f0(jnp.zeros(())))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(f0(jnp.zeros(())))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def device_timer(fn, *args, reps: int = 5):
    """Median wall ms of fn(*args) with forced readback (includes one
    dispatch round-trip)."""
    readback(fn(*args))  # warm / compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def amortized_timer(step_fn, init_carry, iters: int = 8, reps: int = 3,
                    null_ms: float = 0.0):
    """Per-iteration ms of ``carry -> carry`` step_fn, amortized over a
    scan of ``iters`` inside one dispatch.

    REQUIREMENT: the carry must feed the expensive computation's INPUTS
    (e.g. ``c2w + 1e-7 * c``), not just fold its outputs. A body whose
    real work depends only on loop-invariant closure constants can be
    hoisted/CSE'd by XLA: bench_train timed the stage-1 step that way and
    reported 8.4 ms/step for a ~19 ms step (2.3x off — see
    results/probes_r4_step_timing.txt and DESIGN.md round-4 notes)."""
    import jax

    @jax.jit
    def loop(c):
        def body(c, _):
            return step_fn(c), ()

        c, _ = jax.lax.scan(body, c, None, length=iters)
        return c

    readback(loop(init_carry))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(loop(init_carry))
        times.append((time.perf_counter() - t0) * 1e3)
    return (float(np.median(times)) - null_ms) / iters


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace('/tmp/jax-trace'): ...`` -> profile for TensorBoard."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _dense_macs(dims):
    return sum(a * b for a, b in dims)


def pipeline_macs(H: int, W: int, *, N_samples=8, N_point_ray_enc=48,
                  num_neighbor=4, netwidth=256, mmnetwidth=256,
                  netdepth=8, mmnetdepth=6):
    """Analytic MACs per frame, split per net (the reference prints the
    sampler+refine total via ptflops, ``run_S_eS_eN_alter_trt.py:320-344``)."""
    rays = H * W
    pts = rays * N_samples
    W_ = netwidth
    nerf_dims = (
        [(63, W_)] + [(W_, W_)] * 4 + [(W_ + 63, W_)] + [(W_, W_)] * 2
        + [(W_, 1), (W_, W_), (W_ + 27, W_ // 2), (W_ // 2, 3)]
    )
    mm_in = 6 * N_point_ray_enc
    mw = mmnetwidth
    sampler_dims = [(mm_in, mw)] + [(mw, mw)] * (mmnetdepth - 1) + [
        (mw, 3 * N_samples + 3)
    ]
    ref_in = 6 * N_samples + 3 * num_neighbor * N_samples
    refine_dims = [(ref_in, mw)] + [(mw, mw)] * (mmnetdepth - 1) + [
        (mw, 4 * N_samples + 3)
    ]
    return {
        "nerf": pts * _dense_macs(nerf_dims),
        "sampler": rays * _dense_macs(sampler_dims),
        "refine": rays * _dense_macs(refine_dims),
    }


def xplane_categories(trace_fn, iters: int = 3, stems=None):
    """Capture a ``jax.profiler`` trace of ``trace_fn(i)`` x ``iters`` and
    aggregate TPU device time from the xplane proto, parsed locally (no
    tensorboard). Returns ``(per_cat, per_op, total_ns)`` where per_cat /
    per_op are ``collections.Counter`` of duration_ns keyed by op category
    / full op name. This is the measurement behind every perf decision in
    DESIGN.md (driven by ``scripts/profile_ops.py`` and
    ``scripts/profile_train_ops.py``).

    Control-flow PARENT ops (``while``/``conditional``/``call``) are
    excluded from the totals and reported under a ``"<cat> (inclusive)"``
    key instead: the xplane "XLA Ops" line emits the loop op's INCLUSIVE
    duration alongside its children, so counting both double-counts the
    body. (Round-5 finding: the train-step profile showed "while: 50%"
    that exactly equaled the sum of every other category — there was no
    hidden loop overhead, just the parent event. The honest fern-scale
    step is ~22 ms device, ~90% MLP fusions at the f32 roofline.)"""
    import collections
    import glob
    import tempfile

    import jax

    stems = stems or (
        "fused_nerf", "fused_minmax", "copy", "while", "reshape",
        "transpose", "pad", "concatenate", "dynamic-slice",
        "dynamic-update-slice", "bitcast", "select", "broadcast", "iota",
        "convert", "slice", "reduce", "sort", "scatter", "gather", "all-",
    )

    tmp = tempfile.mkdtemp(prefix="jaxprof_")
    with jax.profiler.trace(tmp):
        for i in range(iters):
            trace_fn(i)

    files = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)
    if not files:
        raise RuntimeError(f"no xplane.pb under {tmp}")
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[0], "rb").read()
    )

    def category(name: str) -> str:
        head = name.lstrip("%").split(" ")[0].split(".")[0]
        for stem in stems:
            if head.startswith(stem):
                return stem
        if "fusion" in head:
            return "fusion"
        return head

    def events():
        for plane in pd.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    yield ev.name, ev.duration_ns

    return aggregate_xplane_events(events(), category)


def aggregate_xplane_events(events, category):
    """Aggregate ``(op_name, duration_ns)`` pairs into
    ``(per_cat, per_op, total_ns)``. Control-flow PARENT ops are routed to
    a ``"<cat> (inclusive)"`` key and excluded from ``total_ns`` and the
    leaf categories (see ``xplane_categories`` docstring for why). Pure —
    unit-tested in tests/test_tools.py without a real trace."""
    import collections

    control_flow = ("while", "conditional", "call")
    per_op = collections.Counter()
    per_cat = collections.Counter()
    inclusive = collections.Counter()
    for name, duration_ns in events:
        cat = category(name)
        if cat in control_flow:
            inclusive[f"{cat} (inclusive)"] += duration_ns
            continue
        per_op[name] += duration_ns
        per_cat[cat] += duration_ns
    total = sum(per_op.values())
    per_cat.update(inclusive)  # visible, but not in the leaf total
    return per_cat, per_op, total
