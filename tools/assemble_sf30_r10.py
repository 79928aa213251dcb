"""Assemble CORRECTNESS_sf30_r10.json from this round's segment runs.

Round-10 sf30 evidence comes from separate serialized runs (one heavy
query family at a time, per the one-Spark-job-per-sweep discipline):

- .tmp/sf30_seg_a.json  -- d3 (digest-sum) + d15 on fixtures/sf30
- .tmp/sf30_seg_b.json  -- dr1 + g13 on fixtures/sf30
- .tmp/sf30p_seg.json   -- d2 + d12 on fixtures/sf30p (--perturb-docs
  fixture so the pair stage executes instead of cap-degenerating to 0)

plus any extra segment files passed on argv.  Rows carry a "fixture"
field when they ran on the perturbed variant.  The r9 artifact
(CORRECTNESS_sf30_r09.json) remains the record for the 12 heavies
replayed last round; this artifact holds the r10 closures.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SEGMENTS = [
    (".tmp/sf30_seg_a.json", None),
    (".tmp/sf30_seg_b.json", None),
    # c re-runs g13 with the proven 48g/32GB memory budget (the b leg ran
    # at default heap and OOM'd); later segments overwrite earlier rows.
    (".tmp/sf30_seg_c.json", None),
    (".tmp/sf30p_seg.json", "sf30p-perturbed"),
]


def main() -> None:
    out: dict[str, dict] = {}
    segs = SEGMENTS + [(p, None) for p in sys.argv[1:]]
    for rel, fixture in segs:
        path = os.path.join(REPO, rel)
        if not os.path.exists(path):
            print(f"missing segment (skipped): {rel}")
            continue
        with open(path) as f:
            recs = json.load(f)
        for name, rec in recs.items():
            if fixture:
                rec = dict(rec, fixture=fixture)
            out[name] = rec
    dest = os.path.join(REPO, "CORRECTNESS_sf30_r10.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    ok = sum(
        1
        for r in out.values()
        if r.get("rows_match") and r.get("schema_match") is not False and r.get("err") is None
    )
    print(f"wrote {dest}: {len(out)} rows, {ok} green")
    for name, r in sorted(out.items()):
        flag = "ok " if (r.get("rows_match") and r.get("err") is None) else "FAIL"
        print(f"  {flag} {name} rows={r.get('spark_rows')} fixture={r.get('fixture', 'sf30')}")


if __name__ == "__main__":
    main()
