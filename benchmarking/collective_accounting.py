"""Multi-device overhead proxy: count GSPMD collective bytes in the
sharded train step's optimized HLO (VERDICT r4 item 8).

The virtual-CPU scaling curve is thread-pool-starved garbage on this
2-core host (PERF_NOTES), so instead of timing, this script measures
the thing that actually costs on real hardware: the bytes each
collective moves per step. It lowers the FULL sharded train step on an
8-device virtual mesh, walks the optimized HLO for collective ops
(all-reduce / all-gather / reduce-scatter / collective-permute / host
transfers), and reports:

  * per-op-kind totals (count, bytes moved per step);
  * the predicted per-step comm time on a v5e ICI ring
    (all-reduce moves 2(n-1)/n x bytes over ~45 GB/s/link ICI);
  * the comm/compute ratio against the measured single-chip step time
    (248 ms at the bench op-point) -> predicted scaling efficiency.

This is a deterministic compile-time analysis — no device timing, so
core starvation cannot pollute it. Run on CPU.

Usage: python benchmarking/collective_accounting.py [n_devices]
"""
from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_DEV}")

import numpy as np


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "s64": 8, "u64": 8}

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8"
                       r"|u8|pred)\[([0-9,]*)\]")


def shape_bytes(text):
    """Total bytes of every typed shape literal in an HLO result type
    (handles tuples by summing members)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


# collective op kinds worth accounting (GSPMD emits these)
_KINDS = ("all-reduce", "all-gather", "reduce-scatter",
          "collective-permute", "all-to-all")


def account(hlo_text):
    stats = defaultdict(lambda: [0, 0])
    for line in hlo_text.splitlines():
        # "%name = <result type> kind(operands...)". The result type of
        # a tuple-shaped collective contains /*index=N*/ comments (with
        # '=' inside), so locate the op application and take every
        # typed shape BEFORE it as the result payload.
        if " = " not in line:
            continue
        rest = line.strip().split(" = ", 1)[1]
        for kind in _KINDS:
            m = re.search(rf"\b{kind}(-start)?\(", rest)
            if m is None or f"{kind}-done" in rest:
                continue            # -start carries the shape
            stats[kind][0] += 1
            stats[kind][1] += shape_bytes(rest[:m.start()])
            break
    return stats


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == N_DEV, jax.devices()

    # reuse the dryrun's sharded-step builder: real mesh, real
    # shardings, the full train step (render + losses + adam + grid).
    # The dryrun's TINY default config is degenerate for accounting:
    # at 16 rays/device GSPMD all-gathers the batch and REPLICATES the
    # whole step (no gradient all-reduce appears at all), so the bytes
    # mean nothing. Lower a mid-size config instead — big enough that
    # the partitioner keeps the data sharding, small enough to compile
    # on CPU in seconds — then check the counted all-reduce bytes
    # against the analytic DP cost (= one f32 gradient per parameter)
    # and project that analytic cost to the production op-point.
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge

    mid = dict(batch_size=256 * N_DEV, density_log2T=15, rgb_log2T=16,
               density_L=8, rgb_L=8, capacity=32, samples_per_ray=16)
    lowered = ge.lower_multichip(N_DEV, **mid)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    stats = account(hlo)
    total_bytes = sum(b for _, b in stats.values())
    print(f"sharded train step on a {N_DEV}-device mesh "
          f"(optimized HLO, {len(hlo.splitlines())} lines, mid config "
          f"{mid['batch_size']} rays, T=2^{mid['density_log2T']}/"
          f"2^{mid['rgb_log2T']}):")
    for kind, (cnt, byts) in sorted(stats.items()):
        print(f"  {kind:20s} x{cnt:3d}  {byts/1e6:10.2f} MB/step")
    if not stats:
        print("  (no collectives found — fully replicated step?)")

    # analytic DP cost at THIS config: one all-reduce of every
    # gradient leaf (params replicated, batch sharded). Grad dtype is
    # f32 (master weights) regardless of bf16 table storage.
    system, _ = ge._multichip_system(N_DEV, mid)
    grad_bytes = sum(int(np.prod(x.shape)) * 4
                     for x in jax.tree.leaves(system.params))
    ar_bytes = stats.get("all-reduce", [0, 0])[1]
    print(f"\n  analytic DP gradient payload {grad_bytes/1e6:.2f} MB; "
          f"counted all-reduce {ar_bytes/1e6:.2f} MB "
          f"({ar_bytes/grad_bytes:.0%} — a healthy step counts ~100%: "
          f"XLA fuses the per-leaf pmeans into one tuple all-reduce; "
          f"~0% means the partitioner replicated the step, the bug "
          f"this probe exists to catch)")

    # v5e ICI: ~45 GB/s per direction per link, ring all-reduce moves
    # 2(n-1)/n x payload over the wire
    ici_bw = 45e9
    n = N_DEV

    def eff(payload, step_ms):
        t_comm_ms = payload * 2 * (n - 1) / n / ici_bw * 1e3
        return t_comm_ms, step_ms / (step_ms + t_comm_ms)

    # production projection: the bench op-point's real param tree
    # (flagship NGP: brick tables at 2^19/2^21), measured 248 ms/step
    from ingp_tpu.models import NGPConfig, ngp_init
    cfg = NGPConfig(scale=0.5, encoder="brick", table_dtype="bfloat16",
                    compute_dtype="bfloat16")
    shapes = jax.eval_shape(lambda k: ngp_init(k, cfg),
                            jax.random.PRNGKey(0))
    prod_bytes = sum(int(np.prod(x.shape)) * 4
                     for x in jax.tree.leaves(shapes))
    step_ms = 248.0     # measured single-chip step at the bench op-point
    t_comm, e = eff(prod_bytes, step_ms)
    print(f"\n  production projection (bench op-point): gradient "
          f"payload {prod_bytes/1e6:.0f} MB -> {t_comm:.1f} ms/step "
          f"on ICI vs {step_ms:.0f} ms compute")
    print(f"  predicted DP scaling efficiency {e:.1%} at n={n} "
          f"(zero overlap assumed; overlapping the table-grad "
          f"all-reduce with the backward raises it)")

    # DP sweep: ring wire bytes saturate at 2x payload, so efficiency
    # is nearly flat in n — DP scales to pod-slice sizes; multi-HOST
    # hops ride the same formula until DCN replaces ICI
    print("\n  n-sweep (same formula, ring all-reduce over ICI):")
    for m in (2, 4, 8, 16, 64, 256):
        t_m = prod_bytes * 2 * (m - 1) / m / ici_bw * 1e3
        print(f"    n={m:3d}: comm {t_m:5.1f} ms -> efficiency "
              f"{step_ms / (step_ms + t_m):.1%}")
    print("\nOK")


if __name__ == "__main__":
    main()
