"""Synthesize a larger scale factor from driver testdata for scale runs.

Replicates each sf0.1 table R times with disjoint key spaces so joins and
group-bys keep their selectivity while row counts grow R×:

- dimension tables (region, nation) are copied as-is;
- fact keys (custkey/orderkey/partkey/suppkey/event_id/user_id/doc_id/
  vec_id) get a per-replica offset, preserving join fan-out;
- document text gets a one-token replica suffix so the near-dup structure
  is preserved *within* each replica without planting R-way cross-replica
  duplicate storms that would change the dedup workload's shape;
- embeddings are cyclically rolled by the replica index (norm-preserving,
  decorrelates cross-replica cosines) for the same reason.

Bench-only data: correctness gates always run on the driver's own parquet.

Usage: python tools/make_scale.py /root/testdata/sf0.1 /tmp/sf1synth 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

KEY_OFF = 100_000_000  # per-replica key offset (beyond any base key)

DIM_TABLES = {"region", "nation"}
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def scale_table(name: str, src: str, dst: str, factor: int) -> int:
    table = pq.read_table(src)
    if name in DIM_TABLES:
        pq.write_table(table, dst)
        return table.num_rows

    replicas = []
    for r in range(factor):
        cols = {}
        for field in table.schema:
            col = table[field.name]
            if field.name in KEY_COLS.get(name, []):
                col = pa.compute.add(col, r * KEY_OFF)
            elif name == "documents" and field.name == "text" and r > 0:
                # prefix every word with a replica marker (no separator,
                # so the marker fuses into the token): bigram shingles map
                # 1:1 onto the original doc's bigrams WITHIN a replica
                # (near-dup structure exactly preserved) while replicas'
                # vocabularies are disjoint, so CROSS-replica Jaccard is
                # ~0. A trailing one-token suffix leaves ~98% shingle
                # overlap across replicas (an R-choose-2 candidate storm
                # at factor 100); a standalone interleaved token makes
                # any shared WORD a shared bigram within the replica —
                # both collapse the dedup workload's shape.
                col = pa.compute.binary_join_element_wise(
                    f"r{r}x",
                    pa.compute.replace_substring(
                        col.cast(pa.string()), " ", f" r{r}x"
                    ),
                    "",
                )
            elif name == "embeddings" and field.name == "embedding" and r > 0:
                # per-replica random ROTATION (seeded QR): preserves every
                # within-replica pairwise cosine exactly while cross-replica
                # cosines drop to ~N(0, 1/d). A cyclic roll wraps at
                # factor > dim (replicas r and r+dim would be identical —
                # planted cross-replica dup storms at factor 100 with d=64).
                mat = np.array(col.to_pylist(), dtype=np.float64)
                rng = np.random.default_rng(1000 + r)
                q, _ = np.linalg.qr(rng.standard_normal(
                    (mat.shape[1], mat.shape[1])
                ))
                mat = (mat @ q).astype(np.float32)
                col = pa.array(list(mat), type=field.type)
            cols[field.name] = col
        replicas.append(pa.table(cols, schema=table.schema))
    out = pa.concat_tables(replicas)
    # bounded row groups: pyarrow's 1M-row default wrote the 200k-row
    # 100x embeddings table as ONE row group, so a Spark scan had ONE
    # non-empty split and every map-side-heavy operator (the kmeans
    # cosine fold most of all) ran single-task regardless of byte-range
    # splits — a harness artifact a real multi-file 100 TB layout never
    # has. 16k-row groups give the scan real parallelism.
    pq.write_table(out, dst, row_group_size=16384)
    return out.num_rows


def main() -> None:
    src_dir, dst_dir = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(dst_dir, exist_ok=True)
    for fn in sorted(os.listdir(src_dir)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        if only is not None and name not in only:
            continue
        n = scale_table(
            name, os.path.join(src_dir, fn), os.path.join(dst_dir, fn), factor
        )
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
