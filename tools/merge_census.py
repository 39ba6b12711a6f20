#!/usr/bin/env python3
"""Assemble the full sf10 census from its three measured parts.

The wide sweep runs in two parts so the paired protocol's per-pass
duck timeout (300 s) never burns passes on the handful of twins known
to run 8-31 MINUTES at sf10:

  part A  — every key except the seven ultra-slow-twin keys, paired
            interleaved (spark + duck in the same window, min-of-N);
  part B  — those seven keys, Spark side only (duck interleave off);
  one-shot — tools/duck_worker.py completions of the five completable
            twins (DUCK_TIMEOUT_SEC=7200, single pass, recorded in
            `ok <key> <sec>` lines); the two documented quadratic
            dedup twins (dd_lev_verify, dd_semantic) stay excluded —
            204 s / 596 s at sf1 and superlinear, so sf10 projects to
            hours-to-days; their sf1 numbers are already on record.

The merged artifact carries every key's Spark time, a duck time for
every key that HAS a twin (paired where the protocol allows, one-shot
completion otherwise, annotated in `duck_protocol_per_key`), and
explicit exclusion notes — no silently-capped keys.

Usage: merge_census.py <detailA.json> <detailB.json> <oneshot.txt> <out.json>
"""
import json
import sys


def main(a_path, b_path, oneshot_path, out_path):
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    oneshot = {}
    for line in open(oneshot_path):
        parts = line.split()
        if len(parts) == 3 and parts[0] == "ok":
            oneshot[parts[1]] = float(parts[2])

    out = dict(a)
    out["queries"] = {**a["queries"], **b["queries"]}
    out["stages"] = {**a.get("stages", {}), **b.get("stages", {})}
    out["shuffle_write_mb"] = {**a.get("shuffle_write_mb", {}),
                               **b.get("shuffle_write_mb", {})}
    out["value"] = round(sum(v for v in out["queries"].values()
                             if isinstance(v, (int, float))), 3)

    duck = dict(a.get("duck_queries", {}))
    protocol = {k: "interleaved" for k in duck}
    for k, v in oneshot.items():
        duck[k] = v
        protocol[k] = "one-shot completion (DUCK_TIMEOUT_SEC=7200)"
    out["duck_queries"] = duck
    out["duck_protocol_per_key"] = protocol
    out["duck_protocol"] = "interleaved + one-shot completions (see duck_protocol_per_key)"

    shared = [k for k in duck if k in out["queries"]]
    spark_shared = sum(out["queries"][k] for k in shared)
    duck_shared = sum(duck[k] for k in shared)
    out["shared_keys"] = len(shared)
    out["spark_total_sec_shared"] = round(spark_shared, 3)
    out["duck_total_sec_shared"] = round(duck_shared, 3)
    out["ratio_shared"] = round(spark_shared / duck_shared, 4)
    out["ratio_per_key"] = {
        k: round(out["queries"][k] / duck[k], 2) for k in sorted(shared)}
    out["census_incomplete"] = []
    out["excluded_quadratic_twins"] = {
        "dd_lev_verify": "sf1 twin 204 s, superlinear — sf10 projects to hours",
        "dd_semantic": "sf1 twin 596 s, superlinear — sf10 projects to hours+",
    }
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    won = sum(1 for k in shared if out["queries"][k] < duck[k])
    print(f"merged: {len(out['queries'])} spark keys, {len(shared)} shared, "
          f"ratio {out['ratio_shared']}, won {won}/{len(shared)}")


if __name__ == "__main__":
    main(*sys.argv[1:5])
