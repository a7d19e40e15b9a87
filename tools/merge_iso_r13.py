#!/usr/bin/env python3
"""Merge r13 isolate-patch rows into an r12 iso JSON (r13 protocol).

The r12 protocol run completed its sf100/sf100c/sf10 legs but was cut
off mid-way through the sf10 isolate pass and never ran sf1/sf0.1
(bench_legs/r12). r13 completes it: the missing isolate keys — plus
fresh post-change rows for the keys r13 edited (q62/q25/q9) — are
measured with the same fresh-JVM method (graft.Explain) into
iso_patch_<sf>.txt, and this tool merges them over the archived r12
iso JSON. Patch rows WIN on overlap (they are newer code); every
overridden key is printed so the BASELINE notes can name them.

Usage: merge_iso_r13.py <r12_iso.json|-> <iso_patch.txt> <out.json>
"""
import json
import re
import sys


def main(base_p, patch_p, out_p):
    base = {} if base_p == "-" else json.load(open(base_p))
    patch = {}
    for line in open(patch_p):
        m = re.match(r"==\s+(\S+)\s+median\s+([\d.]+)\s+s", line.strip())
        if m:
            patch[m.group(1)] = float(m.group(2))
    for k in sorted(set(base) & set(patch)):
        print(f"[merge] {k}: r12 iso {base[k]} -> r13 patch {patch[k]}")
    merged = {**base, **patch}
    json.dump(merged, open(out_p, "w"), indent=1)
    print(f"[merge] wrote {out_p} ({len(merged)} keys: "
          f"{len(base)} base + {len(patch)} patch)")


if __name__ == "__main__":
    main(*sys.argv[1:4])
