#!/usr/bin/env python3
"""Compare two per-query bench maps (builder archives).

Usage: python3 tools/bench_compare.py <old.json> <new.json>
Prints shared-query median ratio, the worst regressions, and totals.
"""
import json
import sys


def main(old_path, new_path):
    old_doc = json.load(open(old_path))
    new_doc = json.load(open(new_path))
    old = old_doc["queries"]
    new = new_doc["queries"]
    # Box-speed normalization: calib_s times an identical fixed-cost CPU
    # probe in both runs, so new_calib/old_calib is the box drift between
    # them. calib_shuffle_s (r15+) times an identical one-exchange probe —
    # the honest normalizer for queries that shuffle, since disk/page-cache
    # contention moves exchanges without moving pure arithmetic. Each
    # query's ratio is divided by the drift of the probe matching its own
    # plan (exchange_bearing list, emitted by Bench from the physical
    # plan) so ratios read as CODE change, not contention.
    cpu_drift = 1.0
    if old_doc.get("calib_s", 0) > 0 and new_doc.get("calib_s", 0) > 0:
        cpu_drift = new_doc["calib_s"] / old_doc["calib_s"]
        print(f"calib_s old {old_doc['calib_s']:.3f}  new "
              f"{new_doc['calib_s']:.3f}  cpu box drift {cpu_drift:.3f}x")
    shuf_drift = cpu_drift
    if (old_doc.get("calib_shuffle_s", 0) > 0
            and new_doc.get("calib_shuffle_s", 0) > 0):
        shuf_drift = new_doc["calib_shuffle_s"] / old_doc["calib_shuffle_s"]
        print(f"calib_shuffle_s old {old_doc['calib_shuffle_s']:.3f}  new "
              f"{new_doc['calib_shuffle_s']:.3f}  shuffle box drift "
              f"{shuf_drift:.3f}x")
    # A query normalizes by the shuffle probe when EITHER run planned an
    # exchange for it (plan changes between runs shouldn't flip silently).
    shuffley = set(old_doc.get("exchange_bearing", [])) \
        | set(new_doc.get("exchange_bearing", []))
    # A query whose warmup failed was never classified — normalize it by
    # the CONSERVATIVE (larger) drift so an unclassified shuffle-bound
    # query can't masquerade as a code regression, and say so.
    unclassified = set(old_doc.get("warmup_failed", [])) \
        | set(new_doc.get("warmup_failed", []))
    if unclassified:
        print(f"warmup-failed (classified by max drift): "
              f"{sorted(unclassified)}")

    # r17+: archives carry an INTERLEAVED probe series (calib_series) and
    # each kept window's measurement slot (q_slot). When both runs have
    # them, each query is normalized by its NEAREST probe in each run —
    # mid-run box drift then moves the probe the query is divided by, not
    # the verdict. Falls back to the global (min-over-series) drift.
    def nearest_probe_fn(doc):
        series, qslot = doc.get("calib_series"), doc.get("q_slot")
        if not series or not qslot:
            return None
        def nearest(q):
            s = qslot.get(q, -1)
            if s < 0:
                return None
            return min(series, key=lambda p: abs(p["slot"] - s))
        return nearest
    old_near, new_near = nearest_probe_fn(old_doc), nearest_probe_fn(new_doc)
    for name, doc in (("old", old_doc), ("new", new_doc)):
        series = doc.get("calib_series")
        if series:
            cpus = [p["cpu"] for p in series]
            shufs = [p["shuf"] for p in series]
            print(f"{name} probe series: {len(series)} probes  "
                  f"cpu [{min(cpus):.3f}..{max(cpus):.3f}]  "
                  f"shuf [{min(shufs):.3f}..{max(shufs):.3f}]")

    def drift(q):
        kind_shuf = q in shuffley
        if old_near and new_near:
            po, pn = old_near(q), new_near(q)
            if po and pn:
                key = "shuf" if kind_shuf else "cpu"
                if q in unclassified and not kind_shuf:
                    return max(pn["shuf"] / po["shuf"], pn["cpu"] / po["cpu"])
                return pn[key] / po[key]
        if q in unclassified and not kind_shuf:
            return max(shuf_drift, cpu_drift)
        return shuf_drift if kind_shuf else cpu_drift

    shared = sorted(set(old) & set(new))
    ratios = sorted((new[q] / old[q] / drift(q), q)
                    for q in shared if old[q] > 0)
    med = ratios[len(ratios) // 2][0] if ratios else float("nan")
    n_shuf = sum(1 for q in shared if q in shuffley)
    print(f"shared {len(shared)} ({n_shuf} exchange-bearing)  "
          f"old-only {len(set(old)-set(new))}  "
          f"new-only {len(set(new)-set(old))}")
    print(f"median calib-normalized ratio new/old: {med:.3f}")
    print("worst 10 regressions (ratio, new_s, old_s, query):")
    for r, q in ratios[-10:][::-1]:
        print(f"  {r:6.2f}  {new[q]:7.3f}  {old[q]:7.3f}  {q}")
    big = [(r, q) for r, q in ratios if r > 2.0 and new[q] > 1.0]
    print(f">2x regressions with new>1s: {len(big)}")
    print("10 most expensive new-run queries:")
    for q in sorted(new, key=new.get, reverse=True)[:10]:
        print(f"  {new[q]:7.3f}  {q}")
    tot_old = sum(old.values())
    tot_new = sum(new.values())
    print(f"totals: old {tot_old:.1f}s/{len(old)} = {tot_old/len(old):.3f} "
          f"s/q   new {tot_new:.1f}s/{len(new)} = {tot_new/len(new):.3f} s/q")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
