"""Scale a testdata SF directory by an integer factor (default 10×).

Produces a larger, referentially-consistent copy of the TPC-H-ish tables
for scale-slope benchmarking (PERF.md): replica i offsets every key column
by i * (max_key + 1) of the source table, so joins fan out 1:1 exactly like
the original (no cross-replica matches, no skew amplification).

Text/embedding tables are MUTATED per replica so content-derived operators
keep their workload shape at scale:
  - documents.text: ~30% of words are replaced with replica-tagged tokens
    (deterministic numpy RNG) — replicas of one doc sit BELOW near-dup
    thresholds, so MinHash-LSH / Jaccard candidate counts scale linearly
    with corpus size instead of quadratically within replica groups.
  - embeddings.embedding: deterministic gaussian noise (sigma 0.05), so
    ANN/KNN neighbor structure is realistic rather than 10 exact copies.

Usage:  python tools/make_sf.py /root/testdata/sf0.1 /tmp/mospark_sf1 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# table -> {column: offset-group}; columns sharing a group get the same
# per-replica offset (FK consistency: lineitem.l_orderkey tracks orders)
KEYED = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "events": {"event_id": "evt", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_ONCE = ("region", "nation")  # fixed dimensions — same at every SF


def _mutate_text(texts: "pa.ChunkedArray", replica: int) -> pa.Array:
    rng = np.random.default_rng(977_131 * replica + 17)
    out = []
    for t in texts.to_pylist():
        if t is None:
            out.append(None)
            continue
        words = t.split(" ")
        n = len(words)
        if n:
            k = max(1, int(0.3 * n))
            idx = rng.choice(n, size=min(k, n), replace=False)
            for j in idx:
                words[j] = f"r{replica}w{int(rng.integers(0, 50_000))}"
        out.append(" ".join(words))
    return pa.array(out, type=pa.string())


def _mutate_vecs(col: "pa.ChunkedArray", replica: int) -> pa.Array:
    rng = np.random.default_rng(411_019 * replica + 3)
    lists = col.to_pylist()
    out = [
        None if v is None else
        (np.asarray(v, dtype=np.float32)
         + rng.normal(0, 0.05, len(v)).astype(np.float32)).tolist()
        for v in lists
    ]
    return pa.array(out, type=pa.list_(pa.float32()))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mospark_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    for name in COPY_ONCE:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied {t.num_rows}")

    # offsets per group: max(key)+1 of the source table that OWNS the group
    owners = {"cust": ("customer", "c_custkey"), "ord": ("orders", "o_orderkey"),
              "part": ("part", "p_partkey"), "supp": ("supplier", "s_suppkey"),
              "evt": ("events", "event_id"), "user": ("events", "user_id"),
              "doc": ("documents", "doc_id"), "vec": ("embeddings", "vec_id")}
    step = {}
    for grp, (tbl, col) in owners.items():
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"), columns=[col])
        step[grp] = int(pc.max(t.column(col)).as_py()) + 1

    for name, keycols in KEYED.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pieces = []
        for i in range(factor):
            rt = t
            for col, grp in keycols.items():
                if i:
                    idx = rt.schema.get_field_index(col)
                    shifted = pc.add(rt.column(col), i * step[grp])
                    rt = rt.set_column(idx, col, shifted.cast(t.schema.field(col).type))
            if i and name == "documents":
                idx = rt.schema.get_field_index("text")
                rt = rt.set_column(idx, "text", _mutate_text(rt.column("text"), i))
            if i and name == "embeddings":
                idx = rt.schema.get_field_index("embedding")
                rt = rt.set_column(idx, "embedding",
                                   _mutate_vecs(rt.column("embedding"), i))
            pieces.append(rt)
        out = pa.concat_tables(pieces)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"),
                       row_group_size=1_000_000)
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
