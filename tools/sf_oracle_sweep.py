#!/usr/bin/env python
"""Driver-style oracle sweep at an arbitrary scale factor (VERDICT r11
#7 / r12 #2): every oracled registry query's Spark plan vs its DuckDB
oracle over a (scaled) testdata directory, order-insensitive typed
compare — the same comparison the driver gate runs at sf0.01, pointed
at a bigger corpus so scale-only divergences (quantile interpolation
ULPs, overflow, engine-specific aggregation order) surface before the
100 TB run would hit them.

Two oracle-side scaffolds keep the DuckDB side inside one box at sf1+
(the SPARK side needs no help — these are oracle-runner limits, not
engine limits):

- CHUNKED RECURSIVE-BPE ENCODE (VERDICT r12 #2): the funnel oracles
  embed the recursive greedy-encode CTE chain; DuckDB materializes the
  whole recursion working set (every (word, rest, ids) intermediate) and
  OOMs around sf1. The sweep precomputes the per-word encodings into a
  temp table in HASH-BUCKETED WORD BATCHES (each batch a bounded
  recursion) and rewrites the oracle's `ewords/estep/ewids` fragment to
  read the table — same greedy segmentation, same ids, bounded memory.
  Verified: chunked == unchunked at sf0.01 (test_sf_sweep_scaffold).

- PER-ORACLE TIMEOUT via duckdb.interrupt() on a watchdog thread.

Usage:
  python tools/sf_oracle_sweep.py SF_DIR [--only a,b,c] [--out F.json]
      [--mem 64GB] [--threads 16] [--timeout 900] [--master local[16]]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import threading
import time

# The documented exact-quadratic small-SF correctness baselines: their
# cost MODEL is all-pairs by design (each has a sub-quadratic scale twin
# that runs in the sweep). Excluded, with the reason recorded per row.
QUADRATIC_BASELINES = {
    "dedup_method_agreement",
    "embedding_near_pairs",
    "embedding_near_pairs_blas",
    "gram_df_spectrum",
    # minhash_precision_audit left this set in r15: its intersections
    # are now row-local array_intersects over candidate pairs (no
    # (pair x gram) intermediate), so it sweeps at sf1 like any query.
    "near_dup_best_survivors",
    "near_dup_clusters",
    "near_dup_containment",
    "near_dup_pagerank_snapped",
    "near_dup_survivors",
    "ngram_jaccard_pairs",
    "semdedup_exact",
    "semdedup_threshold_curve",
}

# Oracles that embed the recursive BPE encode over the whole corpus.
CHUNKED_BPE = {"training_loader_funnel", "funnel_budget_sweep"}

EWIDS_TMP = "sli_sweep_ewids"


def _norm(rows, cols, strict=False):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def f(v):
        if isinstance(v, float):
            # strict (ADVICE r13): keep full precision — a 1-ULP
            # cross-engine divergence in an emitted threshold value must
            # compare as MISMATCH, not be rounded away.
            return "NaN" if math.isnan(v) else (v if strict else round(v, 9))
        return v

    return sorted(
        [tuple(f(r[i]) for i in order) for r in rows],
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def _same(s, d, strict=False):
    if len(s) != len(d):
        return False
    for a, b in zip(s, d):
        if len(a) != len(b):  # column-count drift must never MATCH
            return False
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if strict:
                    if x != y and not (math.isnan(x) and math.isnan(y)):
                        return False
                elif not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif x != y:
                return False
    return True


def _chunked_bpe_rewrite(sql: str) -> str:
    """Rewrite an expanded _bpe_encode_ctes() fragment to read the
    precomputed per-word encodings instead of recursing in-query. The
    replaced text is the exact registration-time expansion; failing
    loudly on a miss beats silently running the OOM form."""
    from scikit_learn_imputer_spark.plans.queries import _bpe_encode_ctes

    full = _bpe_encode_ctes()
    marker = ", ewords AS ("
    cut = full.index(marker)
    tail_marker = "), edocs AS ("
    tail = full.index(tail_marker)
    old = full[cut : tail + 2]  # ", ewords AS (" .. "),"
    new = f", ewids AS (SELECT word, ids FROM {EWIDS_TMP}),"
    assert old in sql, "BPE fragment not found — registration drifted"
    return sql.replace(old, new)


def _build_ewids(con, sf_dir: str, n_buckets: int = 32) -> None:
    """Precompute per-word greedy BPE encodings into EWIDS_TMP, one
    hash bucket of distinct words per recursion (bounded working set)."""
    from scikit_learn_imputer_spark.plans.queries import _bpe_encode_ctes

    full = _bpe_encode_ctes()
    # vocab VALUES literal + unk_base, verbatim from the oracle builder.
    vocab_cte = full[: full.index(",\nbtoks AS (")]
    estep = full[full.index("), estep(") + 3 : full.index("), ewids AS (")]
    con.execute(
        rf"""CREATE OR REPLACE TEMP TABLE sli_sweep_words AS
SELECT DISTINCT unnest(
  CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       ELSE str_split_regex(trim(text), '\s+') END) AS word
FROM read_parquet('{sf_dir}/documents.parquet')"""
    )
    con.execute(
        f"CREATE OR REPLACE TEMP TABLE {EWIDS_TMP} "
        "(word VARCHAR, ids VARCHAR)"
    )
    for b in range(n_buckets):
        estep_b = estep.replace(
            "FROM ewords",
            f"FROM (SELECT word FROM sli_sweep_words "
            f"WHERE hash(word) % {n_buckets} = {b}) ewords",
        )
        con.execute(
            f"""INSERT INTO {EWIDS_TMP}
WITH RECURSIVE {vocab_cte},
{estep_b})
SELECT word, ids FROM estep WHERE rest = ''"""
        )


def _run_oracle(con, sql: str, timeout_s: float):
    """Execute with a watchdog that interrupts the connection."""
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            con.interrupt()

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        res = con.execute(sql)
        rows = res.fetchall()
        cols = [x[0] for x in res.description]
        return rows, cols, None
    except Exception as exc:  # interrupted or real failure
        return None, None, str(exc)[:200]
    finally:
        done.set()


def changed_queries(repo_root: str, since: str) -> set[str]:
    """Registry query names affected by commits/working-tree changes
    since ``since`` (VERDICT r13 #4 — the cheap delta-sweep gate): a
    static reachability closure, deliberately CONSERVATIVE (false
    positives sweep a few extra rows; false negatives would skip a
    gate).

    1. ``git diff -U0 <since>`` over the package's .py files yields
       changed line ranges; each maps (via ast of the CURRENT file) to
       the enclosing top-level def/class -> the seed symbol set.
    2. The seed set closes over the package: any top-level def whose
       source mentions a tainted symbol becomes tainted (fixpoint) —
       so a change to stats.exact_rank_quantiles taints
       split.stratified_quality_sample, which taints the funnel
       helpers.
    3. Every registered query whose plan function source mentions a
       tainted symbol (or whose own body changed) is returned.
    """
    import ast
    import subprocess

    pkg = os.path.join(repo_root, "scikit_learn_imputer_spark")
    diff = subprocess.run(
        ["git", "-C", repo_root, "diff", "-U0", since, "--",
         "scikit_learn_imputer_spark/*.py",
         "scikit_learn_imputer_spark/**/*.py"],
        capture_output=True, text=True, timeout=60, check=True,
    ).stdout
    changed_ranges: dict[str, list[tuple[int, int]]] = {}
    removed_defs: set[str] = set()
    cur = None
    for line in diff.splitlines():
        if line.startswith("+++ b/"):
            cur = line[6:]
        elif line.startswith("-def ") or line.startswith("-    def "):
            # a deleted (or renamed-away) function: its name can no
            # longer be mapped via ast of the current file — taint it
            # directly from the diff's minus line.
            name = line.lstrip("-").strip()[4:].split("(", 1)[0].strip()
            if name:
                removed_defs.add(name)
        elif line.startswith("@@") and cur and cur.endswith(".py"):
            # @@ -a,b +c,d @@ — take the NEW-file range (c, d)
            new = line.split("+", 1)[1].split(" ", 1)[0]
            start, _, span = new.partition(",")
            lo = int(start)
            n = int(span) if span else 1
            changed_ranges.setdefault(cur, []).append(
                (lo, lo + max(n, 1) - 1)
            )
    # Top-level symbol table of the whole package: name -> source text.
    symbols: dict[str, str] = {}
    per_file_defs: dict[str, list[tuple[str, int, int]]] = {}
    for dirpath, _dirs, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            rel = os.path.relpath(path, repo_root)
            try:
                src = open(path).read()
                tree = ast.parse(src)
            except (OSError, SyntaxError):
                continue
            lines = src.splitlines()
            defs = []
            for node in tree.body:
                if isinstance(
                    node,
                    (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
                ):
                    seg = "\n".join(lines[node.lineno - 1 : node.end_lineno])
                    symbols[node.name] = symbols.get(node.name, "") + seg
                    defs.append((node.name, node.lineno, node.end_lineno))
            per_file_defs[rel] = defs
    tainted: set[str] = set(removed_defs)
    for rel, ranges in changed_ranges.items():
        for name, lo, hi in per_file_defs.get(rel, []):
            if any(a <= hi and lo <= b for a, b in ranges):
                tainted.add(name)
    # Fixpoint closure over the package symbol table.
    import re as _re

    changed = True
    while changed:
        changed = False
        for name, seg in symbols.items():
            if name in tainted:
                continue
            for t in tainted:
                if _re.search(rf"\b{_re.escape(t)}\b", seg):
                    tainted.add(name)
                    changed = True
                    break
    import __spark_entry__ as entry

    out = set()
    for qname, fn in entry.queries().items():
        src = symbols.get(getattr(fn, "__name__", ""), "")
        if any(
            _re.search(rf"\b{_re.escape(t)}\b", src) for t in tainted
        ):
            out.add(qname)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--changed-since",
        default="",
        metavar="COMMIT",
        help="sweep only queries whose plan functions or (transitive) "
        "helpers changed since COMMIT (VERDICT r13 #4)",
    )
    ap.add_argument("--out", default="")
    ap.add_argument("--mem", default="64GB")
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument(
        "--strict",
        action="store_true",
        help="exact float compare, no 9dp rounding / 1e-9 tolerance "
        "(ADVICE r13: for threshold-emitting queries a 1-ULP divergence "
        "must MISMATCH)",
    )
    args = ap.parse_args()

    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from scikit_learn_imputer_spark.session import get_spark

    spark = get_spark(
        "sf_sweep",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]

    # FRESH CONNECTION PER ORACLE: one OOM permanently exhausts a shared
    # DuckDB allocator, cascading bogus failures into every later query
    # (observed in the first r13 sf1 run). Views are free to recreate;
    # only the chunked BPE table costs a rebuild, and just for the two
    # funnel oracles.
    def fresh_con(with_bpe: bool):
        c = duckdb.connect()
        # temp_directory enables OUT-OF-CORE operators (hash joins /
        # aggregates spill instead of OOM-ing — the funnel oracles' gram
        # hashes exceed RAM at sf1); preserve_insertion_order=false
        # releases the ordering buffers pipeline-by-pipeline.
        c.execute(
            f"SET memory_limit='{args.mem}'; SET threads TO {args.threads}; "
            f"SET temp_directory='/tmp/sli_sweep_spill'; "
            f"SET preserve_insertion_order=false;"
        )
        for t in tables:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf_dir}/{t}.parquet')"
            )
        if with_bpe:
            t0 = time.time()
            _build_ewids(c, args.sf_dir)
            print(
                f"sweep: chunked BPE encode {round(time.time() - t0, 1)}s",
                file=sys.stderr, flush=True,
            )
        return c

    qs, orc = entry.queries(), entry.oracle_sql()
    names = sorted(qs)
    if args.only:
        want = [n.strip() for n in args.only.split(",") if n.strip()]
        unknown = sorted(set(want) - set(names))
        assert not unknown, f"--only unknown: {unknown}"
        names = [n for n in names if n in set(want)]
    if args.changed_since:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        delta = changed_queries(repo_root, args.changed_since)
        print(
            f"sweep: {len(delta)} queries changed since "
            f"{args.changed_since}", file=sys.stderr, flush=True,
        )
        names = [n for n in names if n in delta]

    results: dict[str, dict] = {}
    for name in names:
        if name in QUADRATIC_BASELINES:
            results[name] = {"status": "excluded_quadratic_baseline"}
            print(f"{name} excluded_quadratic_baseline", flush=True)
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            s = _norm(
                [tuple(r) for r in sdf.collect()], sdf.columns,
                strict=args.strict,
            )
        except Exception as exc:
            results[name] = {"status": "spark_error", "err": str(exc)[:200]}
            print(f"{name} spark_error", flush=True)
            continue
        t_spark = round(time.time() - t0, 1)
        if name not in orc:
            results[name] = {
                "status": "rows_only_anchored",
                "spark_rows": len(s),
                "t_spark": t_spark,
            }
            print(f"{name} rows_only_anchored {len(s)}", flush=True)
            continue
        sql = orc[name]
        if name in CHUNKED_BPE:
            sql = _chunked_bpe_rewrite(sql)
        t0 = time.time()
        try:
            con = fresh_con(with_bpe=name in CHUNKED_BPE)
        except Exception as exc:
            results[name] = {
                "status": "oracle_error",
                "err": f"connect/scaffold: {str(exc)[:160]}",
            }
            print(f"{name} oracle_error (scaffold)", flush=True)
            continue
        rows, cols, err = _run_oracle(con, sql, args.timeout)
        t_duck = round(time.time() - t0, 1)
        con.close()
        if err is not None:
            results[name] = {
                "status": "oracle_error",
                "err": err,
                "t_spark": t_spark,
                "t_duck": t_duck,
                "spark_rows": len(s),
            }
            print(f"{name} oracle_error {err[:80]}", flush=True)
            continue
        d = _norm(rows, cols, strict=args.strict)
        ok = _same(s, d, strict=args.strict)
        results[name] = {
            "status": "MATCH" if ok else "MISMATCH",
            "rows": len(s),
            "t_spark": t_spark,
            "t_duck": t_duck,
        }
        print(f"{name} {'MATCH' if ok else 'MISMATCH'} {len(s)} "
              f"spark={t_spark}s duck={t_duck}s", flush=True)

    summary: dict[str, int] = {}
    for v in results.values():
        summary[v["status"]] = summary.get(v["status"], 0) + 1
    out = {
        "sf_dir": args.sf_dir,
        "summary": summary,
        "results": results,
    }
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(summary, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
