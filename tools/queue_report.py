"""Summarize /tmp/chip_queue.log into a ranked table.

Each queue entry appends "--- <name> <time>" then the bench's JSON line
(or an error tail). Prints name, nominal and executed Mrays/s, speedup vs
the batch's default anchor, and flags entries whose output wasn't a JSON
line (compile wall / crash / timeout).

Usage: python tools/queue_report.py [/tmp/chip_queue.log]
"""
import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/chip_queue.log"
    rows = []
    name = None
    payload = []
    for line in open(path):
        line = line.rstrip("\n")
        if line.startswith("--- "):
            if name is not None:
                rows.append((name, payload))
            name = line.split()[1]
            payload = []
        elif line.startswith("==="):
            if name is not None:
                rows.append((name, payload))
                name = None
                payload = []
        elif name is not None:
            payload.append(line)
    if name is not None:
        rows.append((name, payload))

    parsed = []
    for name, payload in rows:
        rec = None
        for ln in payload:
            try:
                cand = json.loads(ln)
                if isinstance(cand, dict) and "value" in cand:
                    rec = cand
            except (json.JSONDecodeError, ValueError):
                continue
        parsed.append((name, rec, payload))

    anchor = next((r[1]["value"] for r in parsed
                   if r[0] == "default" and r[1]), None)
    print(f"{'entry':18s} {'Mrays/s':>8s} {'exec':>8s} {'vs def':>7s}")
    multiline = []
    for name, rec, payload in parsed:
        if rec is None:
            # knockout/scaling entries print per-variant/per-size lines,
            # not one JSON — collect and show them in full below
            info = [ln for ln in payload
                    if ("ms" in ln or "N=" in ln or ":" in ln)
                    and not ln.startswith("backend")]
            if info:
                multiline.append((name, info))
                print(f"{name:18s} {'multi':>8s}  ({len(info)} lines, below)")
            else:
                tail = payload[-1][:60] if payload else "(no output)"
                print(f"{name:18s} {'FAIL':>8s}  -> {tail}")
            continue
        v = rec.get("value")
        ex = rec.get("executed_mrays_per_s", float("nan"))
        rel = f"{v / anchor:5.2f}x" if anchor else "  n/a"
        stale = "  STALE" if rec.get("stale") else ""
        print(f"{name:18s} {v:8.2f} {ex:8.2f} {rel:>7s}{stale}")
    for name, info in multiline:
        print(f"\n== {name}")
        for ln in info:
            print("  " + ln)
    good = sorted((r for r in parsed if r[1]), key=lambda r: -r[1]["value"])
    if good:
        print(f"\nbest: {good[0][0]} at {good[0][1]['value']} Mrays/s")


if __name__ == "__main__":
    main()
