#!/usr/bin/env python3
"""Round-over-round per-query bench delta report.

Usage: python3 tools/benchdelta.py OLD.json NEW.json [pct_band]

Compares the "queries" maps of two Bench artifacts and prints queries
whose timing moved beyond pct_band percent (default 30 — the
documented single-shot noise band on this machine). bench.json is
committed at round close since r16, so compare rounds via
    git show <old-rev>:bench.json > /tmp/old.json
    python3 tools/benchdelta.py /tmp/old.json bench.json
Older driver BENCH_r*.json wrappers truncate their stdout "tail"
mid-map; for those the leading map fragment is recovered by regex
(queries that fell outside the capture window are absent).
Remember the protocol: a delta here is ATTRIBUTION INPUT — only an
interleaved same-session AbBench rep set decides revert-vs-noise.
Exit code is always 0: this is attribution input for an interleaved
AbBench session (only same-session reps decide revert-vs-noise),
never a gate by itself.
"""
import json
import re
import sys


def load_queries(path):
    with open(path) as f:
        raw = f.read()
    # driver artifacts wrap the Bench stdout; find the metric line
    tail = None
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and "tail" in d and "queries" not in d:
            tail = d["tail"]
            raw = tail
    except json.JSONDecodeError:
        pass
    m = None
    for cand in re.findall(r'\{"metric".*?\}(?=\s|$)', raw, re.DOTALL):
        try:
            parsed = json.loads(cand)
        except json.JSONDecodeError:
            continue
        if m is None or "queries" in parsed:
            m = parsed
    if m is None:
        try:
            m = json.loads(raw)
        except json.JSONDecodeError:
            m = {}
    if "queries" not in m and tail is not None:
        # truncated driver capture: the leading fragment of the full
        # line's trailing queries map — recover what survived
        frag = tail.split("}", 1)[0]
        qs = {k: float(v) for k, v in
              re.findall(r'"(q\d+_\w+)":([0-9.]+)', frag)}
        m["queries"] = qs
    return m.get("queries", {}), m


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    band = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    old_q, old_m = load_queries(old_path)
    new_q, new_m = load_queries(new_path)
    print(f"# {old_path} total={old_m.get('value')} vs "
          f"{new_path} total={new_m.get('value')} (band ±{band:.0f}%)")
    rows = []
    for name in sorted(set(old_q) & set(new_q)):
        o, n = old_q[name], new_q[name]
        if o <= 0:
            continue
        pct = (n - o) / o * 100.0
        if abs(pct) > band:
            rows.append((pct, name, o, n))
    for pct, name, o, n in sorted(rows, key=lambda r: -r[0]):
        print(f"{pct:+7.1f}%  {name}: {o:.3f} -> {n:.3f}")
    only_old = sorted(set(old_q) - set(new_q))
    only_new = sorted(set(new_q) - set(old_q))
    if only_old:
        print("dropped:", ", ".join(only_old))
    if only_new:
        print("added:", ", ".join(only_new))
    if not rows:
        print(f"no per-query move beyond ±{band:.0f}%")


if __name__ == "__main__":
    main()
