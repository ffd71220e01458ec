#!/usr/bin/env python3
"""Serve-economics pin checker (r16 - VERDICT r15 #5).

Usage: python3 tools/check_pins.py <run.json> [<run2.json> ...]

Each argument is a file holding one `{"kind": "serve_pins", ...}` line
as printed by `runMain graft.tools.ServeProbe <sfDir> --pins` (extra
non-JSON lines are skipped, so a full run log works). With several run
files, the MEDIAN per ratio across runs is checked - the same
median-of-runs statistic the pin discipline uses; a single file checks
that run's ratios directly (noisier: the envelope is a per-run range,
so one run inside it proves nothing broke, one run outside it merits a
second run before re-pinning).

Exit 0 when every median sits inside the recorded [lo, hi] envelope in
tools/pins.json; exit 1 otherwise, naming each escaped ratio. Dev-only
tooling (the library itself has no Python dependency).
"""
import json
import os
import statistics
import sys


def load_run(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"serve_pins"' in line:
                d = json.loads(line)
                return d["ratios"], d.get("raw_ms", {})
    raise SystemExit(f"no serve_pins JSON line in {path}")


def main(paths):
    pins_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "pins.json")
    with open(pins_path) as f:
        reg = json.load(f)
    pins = reg["ratios"]
    # walls (r18 - VERDICT r17 #2): absolute ServeProbe milliseconds.
    # Ratios are blind to a proportional rise across tiers (the
    # r15->r17 pq_batch20 ratchet passed every ratio envelope); the
    # walls section trips on the absolute level itself.
    walls = reg.get("walls", {})
    runs = [load_run(p) for p in paths]
    failed = []
    checks = [(pins, [r for r, _ in runs], "pinned"), \
              (walls, [w for _, w in runs], None)]
    for table, series, pin_key in checks:
        for name, pin in sorted(table.items()):
            vals = [r[name] for r in series if name in r]
            if not vals:
                failed.append(f"{name}: missing from every run file")
                continue
            med = statistics.median(vals)
            ok = pin["lo"] <= med <= pin["hi"]
            mark = "OK  " if ok else "FAIL"
            pinned = f"pinned {pin['pinned']}, " if pin_key else ""
            print(f"[{mark}] {name}: median {med:.4f} over {len(vals)} run(s) "
                  f"({pinned}envelope [{pin['lo']}, {pin['hi']}])")
            if not ok:
                failed.append(f"{name}: median {med:.4f} outside "
                              f"[{pin['lo']}, {pin['hi']}]")
    if failed:
        print(f"\n{len(failed)} pin(s) escaped the recorded envelope - "
              "re-run ServeProbe --pins (fresh JVM) and, if the new median "
              "agrees, re-derive the constants per the SCALE.md discipline:")
        for f_ in failed:
            print(f"  - {f_}")
        return 1
    print(f"\nAll {len(pins) + len(walls)} pins inside the recorded envelope "
          f"({len(runs)} run(s)).")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    sys.exit(main(sys.argv[1:]))
