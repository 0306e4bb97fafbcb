"""Deterministic tick-cost simulator for the four pipeline schedules.

Single-chip hardware cannot show the interleaved-1F1B bubble win (every
stage lane runs on the same chip), and the CPU measurement rig's temp
accounting mixes XLA buffer reuse into the comparison — so this tool turns
docs/SCALING.md's "use interleaved 1F1B when bubble time dominates" into
NUMBERS by simulating the exact tick tables the implementations execute
(parallel/pipeline.py; the tick counts below are the same closed-form
expressions the step builders unroll/scan over).

Model.  The SPMD realization runs every slot's math on every device every
tick, masked outside the wave — so wall-clock is (ticks) x (per-tick cost)
and the bubble is exactly the masked-garbage fraction:

  * stage-forward cost f = 1 work unit, stage-backward (recompute-from-
    stash + grad, the 1F1B trade) b = 2 units (Megatron's convention);
    a CHUNK costs 1/V of a stage.
  * useful work per step = M * (f + b).
  * bubble fraction = 1 - useful / total_time.

Tick counts (mirroring the code):
  * GPipe AD fill-drain (make_pp_train_step): M+S-1 forward ticks at cost
    f + the AD-transposed reverse, M+S-1 ticks at cost b; stash grows
    O(M+S) microbatch activations (remat=True trades the stash for +f per
    reverse tick).
  * Contiguous 1F1B (make_pp_1f1b_train_step): M+2S-1 ticks, each running
    one fwd AND one bwd slot (cost f+b); 2S-slot ring stash.
  * Interleaved AD + waves (make_pp_interleaved_train_step): ceil(M/S)
    waves, each sweeping m_w <= S microbatches through SV chunks:
    (m_w + SV - 1) chunk-ticks at f/V forward + the same at b/V reverse,
    waves serialized; stash O(m_w + SV) per wave.
  * Interleaved 1F1B (make_pp_interleaved_1f1b_train_step): n_ticks =
    max_tf + C + 1 with C = SV, max_tf = g_max*C + (V-1)*S + r_max + S-1,
    (g_max, r_max) = divmod(M-1, S) — the exact expression from the
    implementation — each tick at (f+b)/V; 2SV-slot ring stash.

Run:  python tools/pp_schedule_sim.py            # the SCALING.md table
      python tools/pp_schedule_sim.py --sweep    # full (S, V, M) sweep
"""
from __future__ import annotations

import argparse
import json
import math


F_COST = 1.0   # stage-forward work units
B_COST = 2.0   # stage-backward (recompute + grad)


def gpipe_ad(s: int, m: int, remat: bool = False) -> dict:
    fwd_ticks = m + s - 1
    bwd_cost = B_COST + (F_COST if remat else 0.0)
    total = fwd_ticks * F_COST + fwd_ticks * bwd_cost
    useful = m * (F_COST + (B_COST + (F_COST if remat else 0.0)))
    return {"schedule": "gpipe_ad" + ("_remat" if remat else ""),
            "ticks": 2 * fwd_ticks, "time": total,
            "bubble": 1.0 - useful / total,
            "stash_microbatches": 1 if remat else fwd_ticks}


def contiguous_1f1b(s: int, m: int) -> dict:
    ticks = m + 2 * s - 1
    total = ticks * (F_COST + B_COST)
    return {"schedule": "1f1b", "ticks": ticks, "time": total,
            "bubble": 1.0 - m * (F_COST + B_COST) / total,
            "stash_microbatches": 2 * s}


def interleaved_ad_waves(s: int, v: int, m: int, remat: bool = True) -> dict:
    waves = math.ceil(m / s)
    time = 0.0
    for w in range(waves):
        m_w = min(s, m - w * s)
        ticks_w = m_w + s * v - 1
        bwd = (B_COST + (F_COST if remat else 0.0)) / v
        time += ticks_w * (F_COST / v) + ticks_w * bwd
    useful = m * (F_COST + B_COST + (F_COST if remat else 0.0))
    return {"schedule": "interleaved_ad_waves"
            + ("_remat" if remat else ""),
            "ticks": 2 * sum(min(s, m - w * s) + s * v - 1
                             for w in range(waves)),
            "time": time, "bubble": 1.0 - useful / time,
            "stash_microbatches": 1 if remat else min(s, m) + s * v - 1}


def interleaved_1f1b(s: int, v: int, m: int) -> dict:
    c = s * v
    g_max, r_max = divmod(m - 1, s)
    max_tf = g_max * c + (v - 1) * s + r_max + (s - 1)
    ticks = max_tf + c + 1
    total = ticks * (F_COST + B_COST) / v
    return {"schedule": "interleaved_1f1b", "ticks": ticks, "time": total,
            "bubble": 1.0 - m * (F_COST + B_COST) / total,
            "stash_microbatches": 2 * c}


def row(s: int, v: int, m: int) -> list:
    return [gpipe_ad(s, m), gpipe_ad(s, m, remat=True),
            contiguous_1f1b(s, m), interleaved_ad_waves(s, v, m),
            interleaved_1f1b(s, v, m)]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--sweep", action="store_true")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    if args.sweep:
        grid = [(s, v, m) for s in (2, 4, 8) for v in (2, 4)
                for m in (s, 2 * s, 4 * s, 8 * s, 16 * s)]
    else:
        grid = [(4, 2, 4), (4, 2, 8), (4, 2, 16), (4, 2, 32), (4, 2, 64),
                (8, 2, 16), (8, 2, 64), (8, 4, 64)]

    if not args.json:
        print(f"{'S':>2} {'V':>2} {'M':>3}  "
              f"{'schedule':<26} {'time':>8} {'bubble':>7} {'stash(mb)':>9}")
    for s, v, m in grid:
        for r in row(s, v, m):
            if args.json:
                print(json.dumps({"S": s, "V": v, "M": m, **r}))
            else:
                print(f"{s:>2} {v:>2} {m:>3}  {r['schedule']:<26} "
                      f"{r['time']:>8.2f} {r['bubble']:>6.1%} "
                      f"{r['stash_microbatches']:>9}")
        if not args.json:
            print()


if __name__ == "__main__":
    main()
