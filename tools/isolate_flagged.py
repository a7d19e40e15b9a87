#!/usr/bin/env python3
"""Auto-isolate high-spread / high-ratio leg rows (r12 protocol).

After a Spark+DuckDB leg pair, flag keys whose leg row is likely a
throttle artifact and re-measure each in a FRESH JVM (graft.Explain:
untimed warm-up + 3-run median, same full-plan action as Bench), so
BASELINE can publish BOTH columns without cherry-replacing the leg.

Flag rule (documented in BASELINE header):
  - per-query leg spread > 2           and Spark median >= 1.0 s, or
  - Spark/DuckDB ratio > 3             and Spark median >= 2.0 s
The absolute floors keep the sf0.1 fixed-job-floor keys (~0.1-0.2 s,
ratio >3x by construction) from flagging the entire small-SF table.

Usage:
  isolate_flagged.py <spark_leg.json> <duck_leg.json> <sfDir> <out.json>
      [--driver-mem 64g] [--dry-run]

r11 evidence this exists for: q1 27.1 s leg vs 5.4 s isolated, q58
5.75 vs 1.25, q4 15.2 vs 4.8, m1 9.0 vs 1.55 — plans misgraded up to
5x by one throttled leg window.
"""
import json
import subprocess
import sys
import time

SPREAD_FLOOR_S = 1.0
RATIO_FLOOR_S = 2.0
SPREAD_LIMIT = 2.0
RATIO_LIMIT = 3.0


def forced_keys():
    """Optional force list: tools/isolate_force.txt, one key per line.

    For rows the flag rule misses but that still need a fresh-JVM
    column — q62's r11 ratio (2.63x) sits under the 3x auto-flag
    threshold yet is exactly the carried throttle-suspect row the r11
    verdict (task 3) wants measured clean.
    """
    import os
    p = os.path.join(os.path.dirname(__file__), "isolate_force.txt")
    if not os.path.exists(p):
        return []
    return [l.strip() for l in open(p) if l.strip()
            and not l.startswith("#")]


def flagged_keys(spark, duck):
    qs = spark.get("queries", {})
    spreads = spark.get("qspreads", {})
    dqs = duck.get("queries", {}) if duck else {}
    out = []
    force = forced_keys()
    for q, sp in qs.items():
        if sp is None:
            continue
        reason = []
        if spreads.get(q, 0) > SPREAD_LIMIT and sp >= SPREAD_FLOOR_S:
            reason.append(f"spread={spreads[q]:.2f}")
        du = dqs.get(q)
        if du and sp / du > RATIO_LIMIT and sp >= RATIO_FLOOR_S:
            reason.append(f"ratio={sp / du:.2f}x")
        if q in force and not reason and sp >= SPREAD_FLOOR_S:
            reason.append("forced")
        if reason:
            out.append((q, sp, ", ".join(reason)))
    return sorted(out, key=lambda t: -t[1])


def isolate(key, sf_dir, driver_mem):
    """One fresh JVM per key: warm-up + 3-run median via graft.Explain."""
    cmd = ["sbt", "-batch", f"runMain graft.Explain {sf_dir} {key}"]
    env = dict(__import__("os").environ,
               SPARK_DRIVER_MEM=driver_mem, SPARK_GRAFT_CPUS="32")
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=3600)
    for line in p.stdout.splitlines():
        # "== <key>   median 4.332 s  (a, b, c)" — unprefixed since the
        # r12 StdoutOutput change; tolerate the old "[info] " framing.
        if line.strip().lstrip("[info] ").startswith("==") \
                and f" {key} " in line and "median" in line:
            med = float(line.split("median")[1].split("s")[0])
            return med, time.time() - t0
    sys.stderr.write(f"[isolate] {key}: no median line "
                     f"(exit {p.returncode})\n{p.stdout[-500:]}\n")
    return None, time.time() - t0


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    dry = "--dry-run" in argv
    mem = "64g"
    if "--driver-mem" in argv:
        mem = argv[argv.index("--driver-mem") + 1]
    spark_p, duck_p, sf_dir, out_p = args[:4]
    spark = json.load(open(spark_p))
    duck = json.load(open(duck_p)) if duck_p != "-" else {}
    flags = flagged_keys(spark, duck)
    print(f"[isolate] {len(flags)} flagged keys at {sf_dir}")
    for q, sp, why in flags:
        print(f"[isolate]   {q}: leg={sp:.2f}s ({why})")
    if dry:
        return
    result = {}
    for q, sp, why in flags:
        subprocess.run(["bash", "-c",
                        "rm -rf /tmp/graft_local-* /tmp/graft_db_* "
                        "2>/dev/null || true"])
        med, wall = isolate(q, sf_dir, mem)
        if med is not None:
            result[q] = med
            print(f"[isolate]   {q}: leg={sp:.2f}s -> isolated={med:.2f}s "
                  f"({wall:.0f}s incl JVM)")
        json.dump(result, open(out_p, "w"), indent=1)
    print(f"[isolate] wrote {out_p} ({len(result)} keys)")


if __name__ == "__main__":
    main(sys.argv[1:])
