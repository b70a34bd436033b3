#!/usr/bin/env python3
"""Mechanical clean-leg adjudication for two-level scaling pairs.

Protocol (BENCH.md round 5, made mechanical here): the measured job's work
is scale-invariant across parallelism levels (measured: identical work
costs the same executor CPU core-seconds at N and 4N in a clean window),
so a leg is CLEAN iff
    ref_band_lo <= cpu_core_s <= ref_band_hi   (band = ref * (1 +/- BAND_PCT))
    and gc_share <= GC_MAX
where ref = median cpu_core_s over all GC-clean legs of the campaign
(overridable with SCALING_REF_CPU). A pair is clean iff BOTH legs are
affirmatively clean (an unrecorded cpu figure is never clean). The headline
scaling efficiency is the MEDIAN over clean pairs; dirty pairs are still
reported, never discarded.

Usage:
  adjudicate_scaling.py <small.log> <big.log>
      Two ScalingBench logs (one per level). Legs pair by rep index.
  adjudicate_scaling.py --pairs <pairs.json>
      Recorded campaign mode: a JSON list of
      {name, cores_small, cores_big, tps_small, tps_big,
       cpu_small, cpu_big, gc_small, gc_big}   (cpu/gc may be null).

Env knobs (same names ScalingBench reads): SCALING_BAND_PCT (0.10),
SCALING_GC_MAX (0.10), SCALING_REF_CPU (override the median).
"""
import json
import os
import re
import sys

BAND_PCT = float(os.environ.get("SCALING_BAND_PCT", "0.10"))
GC_MAX = float(os.environ.get("SCALING_GC_MAX", "0.10"))
REF_CPU = os.environ.get("SCALING_REF_CPU")


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 == 1 else (s[n // 2 - 1] + s[n // 2]) / 2


def summary_line(path):
    """Last ScalingBench summary JSON line (the one carrying clean_reps)."""
    last = None
    for line in open(path):
        line = re.sub(r"^\[info\] ", "", line.strip())
        if '"clean_reps"' in line:
            try:
                last = json.loads(line)
            except json.JSONDecodeError:
                pass
    if last is None:
        sys.exit(f"no ScalingBench summary line (clean_reps) in {path}")
    return last


def pairs_from_logs(small_path, big_path):
    small, big = summary_line(small_path), summary_line(big_path)
    pairs = []
    for ls, lb in zip(small["legs"], big["legs"]):
        pairs.append({
            "name": f"rep{ls['rep']}",
            "cores_small": small["cores"], "cores_big": big["cores"],
            "tps_small": ls["triples_per_sec"], "tps_big": lb["triples_per_sec"],
            "cpu_small": ls["cpu_core_s"], "cpu_big": lb["cpu_core_s"],
            "gc_small": ls["gc_share"], "gc_big": lb["gc_share"],
        })
    if len(small["legs"]) != len(big["legs"]):
        print(f"note: unpaired legs dropped (small {len(small['legs'])}, "
              f"big {len(big['legs'])})", file=sys.stderr)
    return pairs


def leg_verdict(cpu, gc, lo, hi):
    """clean requires an AFFIRMATIVE in-band cpu figure; a null gc passes
    the GC test (unrecorded legacy legs) but a null cpu is never clean."""
    if cpu is None:
        return {"cpu_core_s": None, "gc_share": gc, "clean": False,
                "why": "cpu unrecorded"}
    reasons = []
    if not (lo <= cpu <= hi):
        reasons.append(f"cpu {cpu:.1f} outside band [{lo:.1f}, {hi:.1f}]")
    if gc is not None and gc > GC_MAX:
        reasons.append(f"gc_share {gc:.3f} > {GC_MAX}")
    return {"cpu_core_s": cpu, "gc_share": gc, "clean": not reasons,
            "why": "; ".join(reasons) or "in band"}


def adjudicate(pairs):
    gc_clean_cpus = [
        c for p in pairs
        for c, g in ((p["cpu_small"], p["gc_small"]), (p["cpu_big"], p["gc_big"]))
        if c is not None and (g is None or g <= GC_MAX)
    ]
    if REF_CPU is not None:
        ref = float(REF_CPU)
    elif gc_clean_cpus:
        ref = median(gc_clean_cpus)
    else:
        sys.exit("no usable cpu_core_s figures to calibrate the band")
    lo, hi = ref * (1 - BAND_PCT), ref * (1 + BAND_PCT)
    out_pairs, clean_effs, all_effs = [], [], []
    for p in pairs:
        ratio = p["cores_big"] / p["cores_small"]
        eff = p["tps_big"] / (ratio * p["tps_small"])
        vs = leg_verdict(p["cpu_small"], p["gc_small"], lo, hi)
        vb = leg_verdict(p["cpu_big"], p["gc_big"], lo, hi)
        clean = vs["clean"] and vb["clean"]
        all_effs.append(eff)
        if clean:
            clean_effs.append(eff)
        vs["triples_per_sec"] = p["tps_small"]
        vb["triples_per_sec"] = p["tps_big"]
        out_pairs.append({"name": p["name"], "efficiency": round(eff, 3),
                          "clean": clean, "small": vs, "big": vb})
    return {
        "protocol": {"band_pct": BAND_PCT, "gc_max": GC_MAX,
                     "ref_cpu_core_s": round(ref, 1),
                     "ref_source": "env" if REF_CPU is not None else "median_gc_clean_legs",
                     "ref_band": [round(lo, 1), round(hi, 1)]},
        "pairs": out_pairs,
        "clean_pairs": len(clean_effs),
        "scaling_efficiency": round(median(clean_effs), 3) if clean_effs else None,
        "scaling_efficiency_all_pairs": round(median(all_effs), 3) if all_effs else None,
    }


def main():
    if len(sys.argv) == 3 and sys.argv[1] == "--pairs":
        pairs = json.load(open(sys.argv[2]))
    elif len(sys.argv) == 3:
        pairs = pairs_from_logs(sys.argv[1], sys.argv[2])
    else:
        sys.exit(__doc__)
    print(json.dumps(adjudicate(pairs), indent=2))


if __name__ == "__main__":
    main()
