#!/usr/bin/env python3
"""Generate the sf1 scale tier (~6M lineitem rows) from the driver's
sf0.1 fixtures, deterministically (seed discipline: every random draw
is seeded from (42, replica[, id])).

Method: 10 replicas of sf0.1 with per-replica key remapping into
disjoint ranges (offset = replica * (max_base_key + 1)), so every join
fan-out, group cardinality, and per-capita duplicate rate is preserved
by construction and the workload scales linearly in the data — the
right shape for measuring whether the ENGINE scales linearly.
Replica 0 is sf0.1 verbatim.

Per-table specifics:
 - region/nation: fixed dimensions, copied as-is (TPC-H semantics).
 - documents: replica r>0 shuffles each doc's tokens with seed
   (42, r, md5(text)) — content-seeded, NOT id-seeded, so the base
   tier's exact-dup groups survive inside every replica (identical
   inputs shuffle identically). Token-frequency features (lang-id,
   quality, token counts) are preserved exactly. CAVEAT on shingle
   similarity: NON-identical near-dup pairs do NOT survive into
   r>0 (two docs differing by one token shuffle under independent
   permutations, collapsing their shingle overlap), so shingle-based
   near-dup OUTPUT stays roughly at the base tier's count rather
   than scaling 10x — the banding/signature stages scale with the
   corpus, the verification stage scales with the (flat) pair
   count. Bag-level (order-free) similarity IS preserved, so
   bag-semantic operators (simhash) see every replica clone as a
   true duplicate and their output explodes quadratically in the
   clone count — both effects are called out in SCALING.md where
   the affected families are read.
 - embeddings: replica r>0 applies one seeded coordinate permutation
   to every vector — an orthogonal transform, so all within-replica
   dot products/cosines (and thus ANN/near-dup workload) are preserved
   exactly while cross-replica similarity is scrambled.
 - events: ts kept (ns-precision preserved); event_id/user_id offset,
   so sessionization scales by users, not by longer histories.

Output: /root/repo/localdata/sf1/*.parquet (gitignored — ~150 MB).
"""
import hashlib
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf1"
# argv[2] overrides the replica count — REPLICAS=1 emits sf0.1
# verbatim in the row-grouped layout (the same-layout scaling
# denominator SCALING.md's ratio table uses)
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SEED = 42

os.makedirs(DST, exist_ok=True)


def write(name: str, table: pa.Table) -> None:
    # version=2.6 keeps timestamp[ns] as parquet TIMESTAMP(NANOS), the
    # physical type the engine's Fixtures.events contract expects.
    # Row groups are bounded to ~64 per table (min 2048 rows) so scan
    # stages can parallelize: a single-row-group file pins every
    # map-side stage (tokenize, md5, n-gram walks) to ONE task on a
    # 32-thread box — a layout no production table has (100-TB tables
    # carry thousands of row groups), so the single-group fixture was
    # mis-measuring map-only operators as serial.
    rg = max(2048, table.num_rows // 64)
    pq.write_table(table, f"{DST}/{name}.parquet", version="2.6",
                   row_group_size=rg)
    print(f"  {name:12s} {table.num_rows:>10,} rows (rg={rg})")


def offset(col: pa.ChunkedArray, k: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(k, type=col.type))


def span_of(table: str, key: str) -> int:
    """Key span measured on the table that OWNS the key — FK columns in
    fact tables must shift by the dimension's span, not their own max
    (not every customer/part appears in orders/lineitem)."""
    return pc.max(pq.read_table(f"{SRC}/{table}.parquet",
                                columns=[key]).column(key)).as_py() + 1


def replicate(name: str, key_spans: dict) -> None:
    """Concat REPLICAS copies with each key column shifted by
    r * span so replica key ranges are disjoint and FK relationships
    stay intact (both sides of a join shift by the same span)."""
    base = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for r in range(REPLICAS):
        t = base
        for c, span in key_spans.items():
            t = t.set_column(t.schema.get_field_index(c), c,
                             offset(t.column(c), r * span))
        parts.append(t)
    write(name, pa.concat_tables(parts))


def gen_documents() -> None:
    base = pq.read_table(f"{SRC}/documents.parquet")
    texts = base.column("text").to_pylist()
    span = pc.max(base.column("doc_id")).as_py() + 1
    parts = [base]
    for r in range(1, REPLICAS):
        new_texts = []
        for txt in texts:
            toks = txt.split(" ")
            content = hashlib.md5(txt.encode()).hexdigest()
            random.Random(f"{SEED}:{r}:{content}").shuffle(toks)
            new_texts.append(" ".join(toks))
        t = base.set_column(base.schema.get_field_index("doc_id"), "doc_id",
                            offset(base.column("doc_id"), r * span))
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.chunked_array([pa.array(new_texts, type=pa.string())]))
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pa.chunked_array([pa.array([len(s) for s in new_texts],
                                                    type=pa.int64())]))
        parts.append(t)
    write("documents", pa.concat_tables(parts))


def gen_embeddings() -> None:
    base = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(base.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    span = pc.max(base.column("vec_id")).as_py() + 1
    parts = [base]
    for r in range(1, REPLICAS):
        perm = np.random.RandomState(SEED + r).permutation(dim)
        permuted = vecs[:, perm]
        t = base.set_column(base.schema.get_field_index("vec_id"), "vec_id",
                            offset(base.column("vec_id"), r * span))
        t = t.set_column(t.schema.get_field_index("embedding"), "embedding",
                         pa.chunked_array([pa.array(list(permuted),
                                                    type=pa.list_(pa.float32()))]))
        parts.append(t)
    write("embeddings", pa.concat_tables(parts))


print(f"generating sf1 into {DST} ({REPLICAS}x sf0.1, seed {SEED})")
for name in ["region", "nation"]:
    write(name, pq.read_table(f"{SRC}/{name}.parquet"))
CUST = span_of("customer", "c_custkey")
SUPP = span_of("supplier", "s_suppkey")
PART = span_of("part", "p_partkey")
ORD = span_of("orders", "o_orderkey")
replicate("customer", {"c_custkey": CUST})
replicate("supplier", {"s_suppkey": SUPP})
replicate("part", {"p_partkey": PART})
replicate("orders", {"o_orderkey": ORD, "o_custkey": CUST})
replicate("lineitem", {"l_orderkey": ORD, "l_partkey": PART, "l_suppkey": SUPP})
replicate("events", {"event_id": span_of("events", "event_id"),
                     "user_id": span_of("events", "user_id")})
gen_documents()
gen_embeddings()
print("done")
