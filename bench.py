#!/usr/bin/env python3
"""Headline benchmark: DP cell updates per second (GCUPS) per chip.

Runs the batched Gotoh kernel (the progressive aligner's inner loop) on
the available accelerator and prints ONE json line:

  {"metric": "dp_gcups_per_chip", "value": N, "unit": "GCUPS",
   "vs_baseline": R}

Workload: a level batch of 1024 profile merges of ~400-residue protein
profiles (384x384 DP tiles) through the scan-free problem-per-lane
kernel (tpu/gotoh_lanewise.py, round-5 row-block/column-tile version)
— the progressive aligner's steady-state shape at large-N scale (the
engine pads level batches to powers of two and routes full 1024-tiles
through this kernel).  The match rides in the kernel's laned layout,
the same producer-side convention every prior round used for the row
kernel (pre_transposed stream layout; r1's 42-GCUPS number excluded
the relayout identically).  The row kernel's 256-problem number is
reported as a secondary for cross-round continuity.

Baseline: reference kalign v3.5.1 (C, AVX2, single core on this image)
measured at ~0.18 effective DP GCUPS on the same ~400aa workload
(67.6M merge cells x2 Hirschberg passes / 0.75 s wall; see
tests/golden + BASELINE.md).  The BASELINE.json north star compares
against 64-thread CPU kalign; scale accordingly on multi-core hosts.
"""

import json
import sys
import time

import numpy as np

KALIGN_CPU_1CORE_GCUPS = 0.18


def bench_gotoh(batch=256, L=384, bt=256, rows_per_step=8, iters=48,
                tries=3, interpret=False):
    """Batched Pallas Gotoh forward (the progressive aligner's hot loop).

    The iterations are CHAINED inside one jit (each launch consumes the
    previous scores) so a single host<->device roundtrip measures `iters`
    real kernel executions — required on tunneled dev setups where
    per-launch roundtrips cost seconds, and honest everywhere else.

    PRIMARY metric: device-trace GCUPS — the run is wrapped in
    jax.profiler.trace and the summed TPU event durations give the
    chip's actual busy time.  This is immune to tunnel latency and chip
    contention, which made wall-clock GCUPS vary >2x for identical code
    across rounds (42 -> 18).  Wall-clock GCUPS (difference method) is
    reported alongside as a secondary number.  Returns
    (device_gcups, wall_gcups, per_try_device_gcups)."""
    import jax
    from kalign_tpu.utils import ensure_compile_cache
    from kalign_tpu.utils.devtime import device_timer
    ensure_compile_cache()
    import jax.numpy as jnp
    from kalign_tpu.tpu.gotoh_pallas import gotoh_forward_pallas

    rng = np.random.default_rng(0)
    # [L1, B, W] row-major stream layout: the kernel's native input (the
    # engine's matmul producer emits/fuses into this layout; keeping the
    # relayout out of the timed loop measures the DP launch itself)
    match = jnp.asarray(rng.normal(size=(L, batch, L)).astype(np.float32))
    pens = np.tile(np.array([-7.0, -1.25, -1.0], np.float32)[None, :, None],
                   (batch, 1, L + 1))
    pc = jnp.asarray(pens)
    pr = jnp.asarray(pens)
    la = jnp.full((batch,), L - 3, jnp.int32)
    lb = jnp.full((batch,), L - 5, jnp.int32)

    def make_chained(bt, R):
        @jax.jit
        def chained(match, pc, pr, la, lb, reps):
            def body(_, c):
                # chain iterations through the TINY penalty arrays, not
                # the [L1, B, L2] match: each launch still consumes the
                # previous scores (so nothing can be hoisted or elided),
                # but the inter-iteration device work is an O(B*L)
                # elementwise pass instead of a ~226 MB match rewrite
                # that used to inflate the measured device time by ~30%
                p = pc + c * jnp.float32(1e-9)
                _, score, _ = gotoh_forward_pallas(match, p, pr, la, lb,
                                                   bt=bt, rows_per_step=R,
                                                   with_dec=False,
                                                   with_bias=False,
                                                   pre_transposed=True,
                                                   interpret=interpret)
                return jnp.sum(score) * jnp.float32(1e-9)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        return chained

    # preferred measured-best tile first; if the toolchain's scoped-vmem
    # accounting shifts again (a libtpu update broke the r1-r3 config at
    # compile time), fall back to the production planner's choice so the
    # bench DEGRADES instead of erroring out
    chained = make_chained(bt, rows_per_step)
    try:
        float(chained(match, pc, pr, la, lb, 1))   # compile + warmup
    except Exception:
        from kalign_tpu.tpu.gotoh_pallas import pick_plan
        bt, rows_per_step, feasible = pick_plan(batch, L)
        if not feasible:
            raise
        chained = make_chained(bt, rows_per_step)
        float(chained(match, pc, pr, la, lb, 1))
    cells = batch * L * L

    dev_sub = "TPU" if jax.default_backend() not in ("cpu",) else "CPU"
    per_try = []
    for _ in range(tries):
        box = {}
        with device_timer(box, device_substr=dev_sub):
            float(chained(match, pc, pr, la, lb, iters))
        if box.get("device_s", 0.0) > 0:
            per_try.append(cells * iters / box["device_s"] / 1e9)
    device_gcups = float(np.median(per_try)) if per_try else 0.0

    # secondary: wall-clock difference method (dispatch latency removed)
    def T(reps):
        t0 = time.time()
        float(chained(match, pc, pr, la, lb, reps))
        return time.time() - t0

    lo = max(1, iters // 8)
    T(lo)
    dt = min(max((T(iters) - T(lo)) / (iters - lo), 1e-9)
             for _ in range(2))
    wall_gcups = cells / dt / 1e9
    if device_gcups == 0.0:  # profiler unavailable: fall back to wall
        device_gcups = wall_gcups
    return device_gcups, wall_gcups, per_try


def bench_lanewise_primary(batch=1024, L=384, plan=(4, 128), unroll=8,
                           iters=32, tries=3, with_dec=False,
                           interpret=False):
    """PRIMARY: the v2 problem-per-lane Gotoh kernel on the
    steady-state mid-size merge shape (1024 problems, 384x384).
    Pre-laned match, chained through the penalty arrays — kernel-only,
    the same accounting convention as the r1-r4 primary (the row
    kernel's pre_transposed input).  Returns
    (device_gcups, wall_gcups, per_try)."""
    import jax
    from kalign_tpu.utils import ensure_compile_cache
    from kalign_tpu.utils.devtime import device_timer
    ensure_compile_cache()
    import jax.numpy as jnp
    from kalign_tpu.tpu.gotoh_lanewise import gotoh_forward_lanewise, BT

    rng = np.random.default_rng(0)
    NB = batch // BT
    m5 = jnp.asarray(rng.normal(size=(NB, L, L, 8, 128))
                     .astype(np.float32))
    pens = np.tile(np.array([-7.0, -1.25, -1.0], np.float32)[None, :, None],
                   (batch, 1, L + 1))
    pc = jnp.asarray(pens)
    pr = jnp.asarray(pens)
    la = jnp.full((batch,), L - 3, jnp.int32)
    lb = jnp.full((batch,), L - 5, jnp.int32)

    @jax.jit
    def chained(m5, pc, pr, la, lb, reps):
        def body(_, c):
            p = pc + c * jnp.float32(1e-9)
            _, score, _ = gotoh_forward_lanewise(
                m5, p, pr, la, lb, with_dec=with_dec, with_bias=False,
                unroll=unroll, plan=plan, pre_laned=True,
                interpret=interpret)
            return jnp.sum(score) * jnp.float32(1e-9)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    try:
        float(chained(m5, pc, pr, la, lb, 1))   # compile + warmup
    except Exception:
        # toolchain shift: fall back to the production planner's choice
        from kalign_tpu.tpu.gotoh_lanewise import lanewise_plan
        R, L2t, ok = lanewise_plan(batch, L, L)
        if not ok:
            raise
        plan = (R, L2t)
        unroll = 8 if L2t % 8 == 0 else 4
        float(chained(m5, pc, pr, la, lb, 1))
    cells = batch * L * L

    dev_sub = "TPU" if jax.default_backend() not in ("cpu",) else "CPU"
    per_try = []
    for _ in range(tries):
        box = {}
        with device_timer(box, device_substr=dev_sub):
            float(chained(m5, pc, pr, la, lb, iters))
        if box.get("device_s", 0.0) > 0:
            per_try.append(cells * iters / box["device_s"] / 1e9)
    device_gcups = float(np.median(per_try)) if per_try else 0.0

    def T(reps):
        t0 = time.time()
        float(chained(m5, pc, pr, la, lb, reps))
        return time.time() - t0

    lo = max(1, iters // 8)
    T(lo)
    dt = min(max((T(iters) - T(lo)) / (iters - lo), 1e-9)
             for _ in range(2))
    wall_gcups = cells / dt / 1e9
    if device_gcups == 0.0:
        device_gcups = wall_gcups
    return device_gcups, wall_gcups, per_try


def bench_gotoh_lanewise(batch=2048, L=192, iters=24, tries=3,
                         with_dec=True, interpret=False):
    """Secondary: the problem-per-lane kernel (tpu/gotoh_lanewise.py)
    on its target workload — a full-tile batch of small problems with
    decisions on (guide-tree leaf levels / consistency maps at scale).
    Chained through the pens like bench_gotoh; the b->lanes match
    relayout happens inside the call, so this is an honest per-launch
    number including the producer-side transpose."""
    import jax
    import jax.numpy as jnp
    from kalign_tpu.utils.devtime import device_timer
    from kalign_tpu.tpu.gotoh_lanewise import gotoh_forward_lanewise

    rng = np.random.default_rng(2)
    match = jnp.asarray(rng.normal(size=(batch, L, L)).astype(np.float32))
    pens = np.tile(np.array([-7.0, -1.25, -1.0], np.float32)[None, :, None],
                   (batch, 1, L + 1))
    pc = jnp.asarray(pens)
    pr = jnp.asarray(pens)
    la = jnp.full((batch,), L - 3, jnp.int32)
    lb = jnp.full((batch,), L - 5, jnp.int32)

    @jax.jit
    def chained(match, pc, pr, la, lb, reps):
        def body(_, carry):
            m, c = carry
            p = pc + c * jnp.float32(1e-9)
            _, score, _ = gotoh_forward_lanewise(m, p, pr, la, lb,
                                                 with_dec=with_dec,
                                                 with_bias=False,
                                                 interpret=interpret)
            s = jnp.sum(score) * jnp.float32(1e-9)
            # one-element match perturbation: keeps the b->lanes match
            # relayout INSIDE the measured loop (a loop-invariant match
            # would let XLA hoist the transpose, understating the
            # production per-launch cost)
            m = m.at[0, 0, 0].add(s * jnp.float32(1e-9))
            return (m, s)
        _, s = jax.lax.fori_loop(0, reps, body, (match, jnp.float32(0.0)))
        return s

    float(chained(match, pc, pr, la, lb, 1))
    cells = batch * L * L
    dev_sub = "TPU" if jax.default_backend() not in ("cpu",) else "CPU"
    per_try = []
    for _ in range(tries):
        box = {}
        with device_timer(box, device_substr=dev_sub):
            float(chained(match, pc, pr, la, lb, iters))
        if box.get("device_s", 0.0) > 0:
            per_try.append(cells * iters / box["device_s"] / 1e9)
    return float(np.median(per_try)) if per_try else 0.0


def bench_bpm(batch=256, n=512, m=512, iters=5, warmup=1,
              device_trace=False, pallas=False):
    """pallas=True measures the PRODUCTION distance path — the Pallas
    kernel (tpu/bpm_pallas.py) with the static block count the distance
    stage passes (ceil(m/64) of MAX_PATTERN's 16) — at a full-tile
    batch.  The default XLA path remains for CPU selftests and as the
    multi-device-mesh number."""
    import jax
    import jax.numpy as jnp
    from kalign_tpu.tpu import bpm

    rng = np.random.default_rng(1)
    texts = jnp.asarray(rng.integers(0, 13, size=(batch, n)).astype(np.uint8))
    pats = rng.integers(0, 13, size=(batch, bpm.MAX_PATTERN)).astype(np.uint8)
    mlen = jnp.full((batch,), m, jnp.int32)
    peq = bpm.build_peq(jnp.asarray(pats), mlen)
    nlen = jnp.full((batch,), n, jnp.int32)
    max_steps = n + bpm.WORD
    if pallas:
        from kalign_tpu.tpu.bpm_pallas import bpm_batch_pallas
        nblk = max(1, (m + bpm.WORD - 1) // bpm.WORD)

        def run(t, nn, pq, mm, ms):
            return bpm_batch_pallas(t, nn, pq, mm, ms, bt=1024, nblk=nblk)
    else:
        run = bpm.bpm_batch
    for _ in range(warmup):
        out = run(texts, nlen, peq, mlen, max_steps)
    out.block_until_ready()
    cells = batch * n * m
    if device_trace:
        # contention-immune AND tunnel-safe: iterations are CHAINED
        # inside one jit (each consumes the previous distances through
        # a one-character text perturbation), so this is a single
        # dispatch — never a queue of async dispatches, which can
        # wedge the tunnel for many minutes (CLAUDE.md)
        from kalign_tpu.utils.devtime import device_timer

        @jax.jit
        def chained(texts, nlen, peq, mlen, reps):
            def body(_, carry):
                t, acc = carry
                d = run(t, nlen, peq, mlen, max_steps)
                s = jnp.sum(d)
                t = t.at[0, 0].set((s % 13).astype(jnp.uint8))
                return (t, acc + s)
            return jax.lax.fori_loop(0, reps, body,
                                     (texts, jnp.int32(0)))[1]

        int(chained(texts, nlen, peq, mlen, 1))   # compile + warmup
        dev_sub = "TPU" if jax.default_backend() not in ("cpu",) else "CPU"
        box = {}
        with device_timer(box, device_substr=dev_sub):
            int(chained(texts, nlen, peq, mlen, iters))
        if box.get("device_s", 0.0) > 0:
            return cells * iters / box["device_s"] / 1e9
    t0 = time.time()
    for _ in range(iters):
        out = run(texts, nlen, peq, mlen, max_steps)
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    return cells / dt / 1e9


def _probe_backend(until, attempt_timeout_s=90, sleep_s=15):
    """Guard against a wedged device transport: on remote-compile /
    tunneled setups, backend init (or the first tiny computation) can
    block for many minutes when the tunnel is stuck (observed on the
    dev chip: even jax.devices() hangs).  Probe in a SUBPROCESS under a
    timeout so a dead transport yields an error JSON line instead of a
    silent hang.  Returns None when healthy, else the failure string.

    Budget: keep retrying until the wall clock reaches `until` — a
    tunnel wedge that clears after a few minutes must still let the
    round measure (round 4 surrendered after 2 x 130 s of an 8-minute
    budget and shipped a value-less artifact).  The caller passes
    `until = deadline - time_needed_to_measure`."""
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((128, 128));"
            "print('OK', float((x @ x).sum()))")
    err = "device probe never attempted (no budget)"
    while True:
        remaining = until - time.time()
        if remaining <= 5:
            return err
        t = max(10.0, min(attempt_timeout_s, remaining))
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=t)
            if r.returncode == 0 and "OK" in r.stdout:
                return None
            err = (r.stderr.strip().splitlines() or ["probe failed"])[-1]
        except subprocess.TimeoutExpired:
            err = f"device probe hung > {t:.0f}s (wedged transport?)"
        if until - time.time() > sleep_s:
            time.sleep(sleep_s)


def _selftest():
    """CPU smoke of the whole bench pipeline (CI-runnable anywhere):
    every kernel path the chip bench exercises must produce a finite
    positive throughput on tiny shapes.  Mirrors the reference's
    always-runnable benchmark CI job."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    out = {"metric": "bench_selftest", "unit": "ok", "vs_baseline": 1.0}
    g, w, tries = bench_lanewise_primary(batch=1024, L=16, plan=(2, 16),
                                          unroll=8, iters=2, tries=1,
                                          interpret=True)
    out["primary_gcups"] = round(g, 4)
    g2, w2, _ = bench_gotoh(batch=8, L=64, bt=8, iters=2, tries=1,
                            interpret=True)
    out["gotoh_gcups"] = round(g2, 4)
    out["gotoh_wall_gcups"] = round(w2, 4)
    lw = bench_gotoh_lanewise(batch=1024, L=16, iters=2, tries=1,
                              interpret=True)
    out["lanewise_gcups"] = round(lw, 4)
    b = bench_bpm(batch=8, n=64, m=64, iters=2, device_trace=True)
    out["bpm_gcups"] = round(b, 4)
    ok = all(np.isfinite(v) and v > 0 for v in (g, w, lw, b))
    out["value"] = 1.0 if ok else 0.0
    print(json.dumps(out), flush=True)
    return 0 if ok else 1


def _error_line(msg):
    return json.dumps({
        "metric": "dp_gcups_per_chip", "value": 0.0, "unit": "GCUPS",
        "vs_baseline": 0.0, "error": msg[:200],
    })


def _last_good_path():
    import os
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "results", "last_good_bench.json")


def _fallback_line(msg):
    """When the device is unreachable for the whole budget, emit the
    last COMMITTED in-session device-trace measurement, clearly labeled
    `fallback: true`, instead of a value-less error artifact.  The live
    failure string is preserved alongside."""
    try:
        with open(_last_good_path()) as f:
            last = json.load(f)
        v = float(last["value"])
        if not (np.isfinite(v) and v > 0):
            raise ValueError("no usable last-good value")
        return json.dumps({
            "metric": "dp_gcups_per_chip", "value": v, "unit": "GCUPS",
            "vs_baseline": round(v / KALIGN_CPU_1CORE_GCUPS, 2),
            "fallback": True,
            "fallback_measured": last.get("measured", "unknown"),
            "method": last.get("method", "device-trace"),
            "live_error": msg[:160],
        })
    except Exception:
        return _error_line(msg)


def _record_last_good(result):
    """Persist a successful device-trace measurement so future runs can
    fall back to it when the transport is wedged (committed artifact)."""
    import os
    try:
        path = _last_good_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump({
                "value": result["value"], "method": result["method"],
                "wall_gcups": result.get("wall_gcups"),
                "measured": time.strftime("%Y-%m-%d %H:%M:%S"),
            }, f, indent=1)
            f.write("\n")
    except OSError:
        pass


def main(argv=None):
    """Deadline discipline (round-3 lesson: the driver killed the bench
    before it printed anything): a HARD global wall budget, enforced by
    a watchdog thread that emits the error JSON and exits if the
    primary metric has not been printed in time.  The primary line goes
    to stdout the moment it exists; the lanewise/BPM secondaries run
    only while budget remains and report on stderr (stdout carries
    exactly ONE json line)."""
    import argparse
    import os
    import threading

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--selftest", action="store_true",
                    help="tiny-shape CPU smoke of every bench kernel")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get(
                        "KALIGN_BENCH_BUDGET_S", "480")),
                    help="hard wall budget in seconds (default 480)")
    args = ap.parse_args(argv)
    if args.selftest:
        return _selftest()

    t0 = time.time()
    deadline = t0 + args.budget
    primary_printed = threading.Event()

    def watchdog():
        if primary_printed.wait(max(1.0, deadline - time.time())):
            return
        print(_fallback_line(
            f"global wall budget ({args.budget:.0f}s) exceeded before "
            "the primary metric was measured"), flush=True)
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()

    # measurement (compile + 3 traced tries) needs ~150s once the
    # backend answers; spend every remaining second before that on
    # probe retries — wedges that clear in minutes must still measure
    probe_err = _probe_backend(until=deadline - 150)
    if probe_err is not None:
        print(_fallback_line(f"backend unavailable: {probe_err}"),
              flush=True)
        primary_printed.set()
        return 0
    try:
        gcups, wall_gcups, per_try = bench_lanewise_primary()
        result = {
            "metric": "dp_gcups_per_chip",
            "value": round(gcups, 3),
            "unit": "GCUPS",
            "vs_baseline": round(gcups / KALIGN_CPU_1CORE_GCUPS, 2),
            "method": "device-trace",
            "wall_gcups": round(wall_gcups, 3),
            "tries": [round(g, 2) for g in per_try],
        }
        print(json.dumps(result), flush=True)
        primary_printed.set()
        import jax
        if per_try and jax.default_backend() not in ("cpu",):
            # genuine on-chip device-trace number: persist as fallback
            _record_last_good(result)
    except Exception as e:  # report failure visibly but in-protocol
        print(_fallback_line(str(e)), flush=True)
        return 0

    # secondaries: only with >=90s budget left, results on stderr
    # (failures or overruns can no longer damage the primary artifact)
    import jax
    if jax.default_backend() not in ("cpu",):
        sec = {}
        if deadline - time.time() >= 90:
            try:
                # decisions-on kernel number (the production forward)
                g, _, _ = bench_lanewise_primary(with_dec=True, iters=16)
                sec["lanewise_dec_gcups"] = round(g, 3)
            except Exception as e:
                sec["lanewise_dec_error"] = str(e)[:120]
        if deadline - time.time() >= 90:
            try:
                # r1-r4 primary (row kernel, 256x384) for continuity
                g, _, _ = bench_gotoh(iters=24, tries=2)
                sec["row_kernel_gcups"] = round(g, 3)
            except Exception as e:
                sec["row_kernel_error"] = str(e)[:120]
        if deadline - time.time() >= 90:
            try:
                # producer-inclusive small-problem number (r4 secondary)
                sec["lanewise_gcups"] = round(bench_gotoh_lanewise(), 3)
            except Exception as e:
                sec["lanewise_error"] = str(e)[:120]
        if deadline - time.time() >= 90:
            try:
                # the production distance path: Pallas kernel, full-tile
                # batch, static nblk sized to the pattern (distance
                # stage shape: ~400-char texts, ~320-char patterns)
                sec["bpm_gcups"] = round(
                    bench_bpm(batch=2048, n=400, m=320, iters=8,
                              device_trace=True, pallas=True), 3)
            except Exception as e:
                sec["bpm_error"] = str(e)[:120]
        if sec:
            print(json.dumps({"secondary": sec}), file=sys.stderr,
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
