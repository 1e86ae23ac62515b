#!/usr/bin/env python
"""Scale-proof bench protocol (VERDICT r13 #7/#8): run a query subset
at several scale factors and consolidate every reading into ONE
``SCALE.json`` keyed by (sf, heap, partitions), with per-pair scaling
exponents.

HEAP RULE (tool-enforced): the r13 control proved that default-heap
super-linear readings are single-JVM GC artifacts — with the heap
scaled to the corpus, repetition_signals' sf1->sf10 exponent dropped
1.183 -> 0.880. So an exponent > 1.0 is only a LABELED FINDING when the
upper row ran with a corpus-scaled heap (>= ~1.6 GB x sf, the 16g-at-
sf10 precedent); otherwise the tool refuses the label and records
``status: needs_heap_control`` with a null exponent — the next run must
re-measure the pair under a scaled heap before anyone reads it as a
plan property.

Usage:
  python tools/scale_bench.py --pair 1=/dir/sf1 --pair 10=/dir/sf10 \
      --queries a,b,c [--heap 16g] [--partitions 32] [--out SCALE.json]
  python tools/scale_bench.py --import-legacy  # fold BENCH_SCALE12_* in

Each bench invocation is a fresh subprocess (fresh JVM — sessions leak
configs otherwise) through bench.py's SPARK_GRAFT_* env contract, so
readings are produced by exactly the machinery the driver runs.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

#: minimum driver-heap GB per unit sf for an exponent >1.0 to be
#: reportable (16 GB at sf10 — the r13 control config).
HEAP_GB_PER_SF = 1.6


def heap_gb(heap: str) -> float:
    h = heap.strip().lower()
    if h.endswith("g"):
        return float(h[:-1])
    if h.endswith("m"):
        return float(h[:-1]) / 1024.0
    raise ValueError(f"unparseable heap {heap!r}")


def exponent_status(exp: float | None, sf_hi: float, heap: str) -> str:
    """The labeling contract: sub-linear exponents are always
    reportable; super-linear ones require the corpus-scaled heap."""
    if exp is None:
        return "failed"
    if exp <= 1.0:
        return "ok"
    if heap_gb(heap) >= HEAP_GB_PER_SF * sf_hi:
        return "superlinear_confirmed_scaled_heap"
    return "needs_heap_control"


def run_bench(sf_dir: str, queries: list[str], heap: str, partitions: int,
              cpus: str = "32") -> dict[str, float]:
    out = tempfile.mktemp(prefix="sli_scale_", suffix=".json")
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=cpus,
        SPARK_GRAFT_DRIVER_MEM=heap,
        SPARK_GRAFT_SHUFFLE_PARTITIONS=str(partitions),
        SPARK_GRAFT_BENCH_ONLY=",".join(queries),
        SPARK_GRAFT_BENCH_OUT=out,
    )
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, check=True,
    )
    with open(out) as fh:
        return {
            k: float(v)
            for k, v in json.load(fh)["queries"].items()
            if isinstance(v, (int, float)) and v > 0
        }


def load_scale(path: str) -> dict:
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {"rows": [], "exponents": []}


def upsert_row(doc: dict, sf: float, heap: str, partitions: int,
               queries: dict[str, float], source: str) -> None:
    key = (sf, heap, partitions)
    for row in doc["rows"]:
        if (row["sf"], row["heap"], row["partitions"]) == key:
            row["queries"].update(queries)
            row["source"] = source
            return
    doc["rows"].append(
        {"sf": sf, "heap": heap, "partitions": partitions,
         "queries": dict(queries), "source": source}
    )


def add_exponents(doc: dict, lo: dict, hi: dict) -> None:
    ratio = hi["sf"] / lo["sf"]
    per_q: dict[str, dict] = {}
    for q, t_hi in hi["queries"].items():
        t_lo = lo["queries"].get(q)
        exp = (
            round(math.log(t_hi / t_lo) / math.log(ratio), 3)
            if t_lo and t_lo > 0 and t_hi > 0
            else None
        )
        status = exponent_status(exp, hi["sf"], hi["heap"])
        per_q[q] = {
            "exponent": exp if status != "needs_heap_control" else None,
            "status": status,
            **(
                {"unlabeled_raw": exp}
                if status == "needs_heap_control"
                else {}
            ),
        }
    entry = {
        "from_sf": lo["sf"], "to_sf": hi["sf"],
        "heap": hi["heap"], "partitions": hi["partitions"],
        "per_query": per_q,
    }
    doc["exponents"] = [
        e for e in doc["exponents"]
        if not (
            e["from_sf"] == entry["from_sf"]
            and e["to_sf"] == entry["to_sf"]
            and e["heap"] == entry["heap"]
            and e["partitions"] == entry["partitions"]
        )
    ] + [entry]


def import_legacy(doc: dict) -> None:
    """Fold the round-12/13 BENCH_SCALE12_* artifact sprawl into rows
    (old files stay on disk for history)."""
    legacy = {
        "BENCH_SCALE12_sf01.json": (0.1, "4g", 32),
        "BENCH_SCALE12_sf1.json": (1.0, "4g", 32),
        "BENCH_SCALE12_sf10.json": (10.0, "4g", 32),
        "BENCH_SCALE12_sf10_p256.json": (10.0, "4g", 256),
    }
    for fname, (sf, heap, parts) in legacy.items():
        p = os.path.join(ROOT, fname)
        if not os.path.exists(p):
            continue
        with open(p) as fh:
            data = json.load(fh)
        qs = {
            k: float(v)
            for k, v in (data.get("queries") or {}).items()
            if isinstance(v, (int, float)) and v > 0
        }
        if qs:
            upsert_row(doc, sf, heap, parts, qs, source=fname)
    # r13 heap-scaled control rows (SF10 control file).
    p = os.path.join(ROOT, "BENCH_SCALE12_SF10.json")
    if os.path.exists(p):
        with open(p) as fh:
            ctl = json.load(fh).get("control_r13_heap_scaled") or {}
        for sf_key, sf in (("sf1_s", 1.0), ("sf10_s", 10.0)):
            qs = {
                k: float(v) for k, v in (ctl.get(sf_key) or {}).items()
            }
            if qs:
                upsert_row(
                    doc, sf, "16g", 32, qs,
                    source="BENCH_SCALE12_SF10.json:control_r13_heap_scaled",
                )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", action="append", default=[],
                    metavar="SF=DIR", help="scale factor and testdata dir")
    ap.add_argument("--queries", default="")
    ap.add_argument("--heap", default="4g")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--out", default=os.path.join(ROOT, "SCALE.json"))
    ap.add_argument("--import-legacy", action="store_true")
    args = ap.parse_args()

    doc = load_scale(args.out)
    if args.import_legacy:
        import_legacy(doc)
    pairs = []
    for spec in args.pair:
        sf_s, _, d = spec.partition("=")
        pairs.append((float(sf_s), d))
    pairs.sort()
    queries = [q for q in args.queries.split(",") if q.strip()]
    for sf, d in pairs:
        qs = run_bench(d, queries, args.heap, args.partitions, args.cpus)
        upsert_row(doc, sf, args.heap, args.partitions, qs,
                   source=f"scale_bench:{d}")
    # Recompute exponents for every adjacent-sf pair within each
    # (heap, partitions) config — including legacy-imported rows, so
    # one artifact carries both the readings and their labels.
    by_cfg: dict[tuple, list[dict]] = {}
    for r in doc["rows"]:
        by_cfg.setdefault((r["heap"], r["partitions"]), []).append(r)
    for cfg_rows in by_cfg.values():
        cfg_rows.sort(key=lambda r: r["sf"])
        for lo, hi in zip(cfg_rows, cfg_rows[1:]):
            add_exponents(doc, lo, hi)
    doc["rows"].sort(key=lambda r: (r["sf"], r["heap"], r["partitions"]))
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({"rows": len(doc["rows"]),
                      "exponent_pairs": len(doc["exponents"])}))


if __name__ == "__main__":
    main()
