#!/usr/bin/env python
"""Scale a driver-generated testdata directory K-fold for SCALE-PROOF
benchmarking (VERDICT r10 #1) — pyarrow only, no Spark session.

The driver ships sf{0.001,0.01,0.1}; the sf1 scale-proof needs a
10x corpus with the SAME distributional shape so per-query scaling
exponents are meaningful. Strategy: replicate every fact table K times
with PRIMARY and FOREIGN keys offset per replica (joins stay consistent
inside each replica block and never cross blocks — exactly how a bigger
TPC-H run behaves), dimensions (region, nation) copied once.

Two shape-preserving details:
- Key offsets are powers of 10 ABOVE the max observed key and SHARED
  between a key's primary table and every table referencing it, so
  referential integrity holds per replica. doc_id offsets are multiples
  of 100, so md5/modulo-derived memberships (benchmark split `doc_id %
  100 < 2`, scaling-law subsets) keep their per-replica proportions.
- Document text gets a per-replica salt token appended (replica 0
  untouched). Without it every doc would have K-1 exact clones, turning
  dup GROUPS super-linear (group size xK => in-bucket pair work xK^2) —
  a manufactured quadratic the real generator doesn't have. With it,
  dup-group COUNTS scale linearly (each replica keeps its own internal
  duplicate structure) while the token/gram density profile shifts by
  one rare token per doc. n_chars stays consistent with the new text.

Usage: python tools/make_scaled_sf.py SRC_DIR DST_DIR K
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: offset_group}; columns in one group share an offset
KEYED = {
    "customer.parquet": {"c_custkey": "cust"},
    "orders.parquet": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem.parquet": {
        "l_orderkey": "ord",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "part.parquet": {"p_partkey": "part"},
    "supplier.parquet": {"s_suppkey": "supp"},
    "events.parquet": {"event_id": "event", "user_id": "user"},
    "documents.parquet": {"doc_id": "doc"},
    "embeddings.parquet": {"vec_id": "vec"},
}
COPY_ONCE = ["region.parquet", "nation.parquet"]


def _pow10_above(v: int) -> int:
    off = 1
    while off <= v:
        off *= 10
    return off


def main(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    tables = {t: pq.read_table(os.path.join(src, t)) for t in KEYED}
    # one offset per key GROUP: a power of 10 above the max key seen in
    # any table using that group (and >=100 for doc so %100 survives)
    group_max: dict[str, int] = {}
    for t, cols in KEYED.items():
        for col, grp in cols.items():
            m = pc.max(tables[t][col]).as_py() or 0
            group_max[grp] = max(group_max.get(grp, 0), int(m))
    offsets = {g: max(_pow10_above(m), 100) for g, m in group_max.items()}
    print("offsets:", offsets, file=sys.stderr)

    for t in COPY_ONCE:
        pq.write_table(pq.read_table(os.path.join(src, t)),
                       os.path.join(dst, t))

    for t, cols in KEYED.items():
        base = tables[t]
        parts = []
        for rep in range(k):
            tb = base
            for col, grp in cols.items():
                if rep == 0:
                    continue
                idx = tb.schema.get_field_index(col)
                typ = tb.schema.field(idx).type
                shifted = pc.add(tb[col], pa.scalar(rep * offsets[grp], typ))
                tb = tb.set_column(idx, tb.schema.field(idx), shifted)
            if t == "embeddings.parquet" and rep > 0:
                # Replica vectors must not be near-copies: cloned (or
                # epsilon-nudged) embeddings make every near-dup family a
                # K-deep clone pile across replicas — pair work xK^2, a
                # blowup the real generator doesn't produce (observed:
                # near_pairs_lsh 4.5s at sf0.1 -> 459s at a naive 10x).
                # Apply a per-replica DIMENSION PERMUTATION instead:
                # within-replica cosines (the planted near-dup families)
                # are preserved EXACTLY, so near structure scales
                # linearly, while cross-replica cosines scramble to the
                # random baseline (P(cos>=0.42) ~ 0 at dim 64).
                import random as _random

                idx = tb.schema.get_field_index("embedding")
                emb = tb["embedding"].to_pylist()
                if emb and emb[0]:
                    dim = len(emb[0])
                    perm = list(range(dim))
                    _random.Random(rep).shuffle(perm)
                    emb = [
                        [vec[perm[i]] for i in range(dim)] if vec else vec
                        for vec in emb
                    ]
                arr = pa.array(emb, type=tb.schema.field(idx).type)
                tb = tb.set_column(idx, tb.schema.field(idx), arr)
            if t == "documents.parquet" and rep > 0:
                salt = f" zrep{rep}"
                idx = tb.schema.get_field_index("text")
                new_text = pc.binary_join_element_wise(
                    tb["text"].cast(pa.string()), pa.scalar(salt), ""
                )
                tb = tb.set_column(idx, tb.schema.field(idx), new_text)
                ci = tb.schema.get_field_index("n_chars")
                ctyp = tb.schema.field(ci).type
                tb = tb.set_column(
                    ci,
                    tb.schema.field(ci),
                    pc.add(tb["n_chars"], pa.scalar(len(salt), ctyp)),
                )
            parts.append(tb)
        out = pa.concat_tables(parts)
        pq.write_table(out, os.path.join(dst, t))
        print(f"{t}: {base.num_rows} -> {out.num_rows}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
